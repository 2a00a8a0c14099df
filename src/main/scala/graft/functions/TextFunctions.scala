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

  // Shingle hashing / MinHash / SimHash kernels live in [[TextKernels]] —
  // compiled per-row loops; the higher-order-function formulation evaluated
  // one interpreted expression tree per element and was ~10× slower.
}
