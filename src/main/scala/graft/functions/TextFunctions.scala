package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling building blocks shared by the dedup and text
  * analysis operators. Everything is built-in higher-order functions —
  * codegen'd, no UDFs — so the hot path stays inside WholeStageCodegen.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles ("w1 w2 w3"), the unit for near-dup Jaccard and
    * MinHash. Docs shorter than n collapse to a single whole-text shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = words(text)
    when(size(w) < n, array(text)).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + lit(1), lit(n)), " "))))
  }

  /** MinHash signature: for each of `k` hash permutations, the minimum
    * xxhash64 over the shingle set. Emitted as `k` aggregate expressions for
    * a single-shuffle groupBy (two-phase partial/final hash aggregate).
    */
  def minhashAggs(shingle: Column, k: Int): Seq[Column] =
    (0 until k).map(i => min(xxhash64(lit(i), shingle)).as(s"sig_$i"))

  /** LSH band key for signature columns `sig_{b*rows} .. sig_{b*rows+rows-1}`:
    * one 64-bit hash per band. Two docs collide in a band iff all `rows`
    * signature slots match.
    */
  def bandHash(b: Int, rows: Int): Column =
    xxhash64((b * rows until (b + 1) * rows).map(i => col(s"sig_$i")): _*)
}
