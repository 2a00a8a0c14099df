package graft

import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Crafted-data specs for the round's new curation operators: corpus-relative
  * quality gating, blocked fuzzy linkage, embedding dimension stats, and the
  * cross-source contamination matrix. The sf0.01 DuckDB oracle checks the
  * same queries end-to-end; these pin the OPERATOR semantics on inputs where
  * the expected answer is computable by hand.
  */
class CurationOpsSpec extends SparkSuite {

  import spark.implicits._

  test("qualityGate drops the bottom quartile per language, never a better doc") {
    // fixed 20-word docs, k of them stopwords → quality = 0.7 − 0.025k,
    // strictly decreasing and distinct. en (8 docs): discrete lower-quartile
    // threshold is the 2nd-lowest level (cum 2 ≥ 8/4) → drops exactly the
    // worst. de (4 docs): the lowest level already covers cum 1 ≥ 4/4 → the
    // threshold IS the minimum, nothing drops (a 4-doc language has no
    // strict bottom quartile under the >= rule).
    def doc(id: Long, lang: String, k: Int): (Long, String, String) =
      (id, lang,
        ((1 to 20 - k).map(i => s"w$i") ++ Seq.fill(k)("the")).mkString(" "))
    val d = ((1 to 8).map(i => doc(i, "en", i)) ++
      (11 to 14).map(i => doc(i, "de", i - 10))).toDF("doc_id", "lang", "text")
    val kept = TextAnalysis.qualityGate(d).collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    assert(keptIds == ((1 to 7).map(_.toLong) ++ (11 to 14).map(_.toLong)).toSet,
      keptIds.toSeq.sorted.mkString(","))
    // gate invariant: every dropped doc scores <= every kept doc in its lang
    val scored = d.select(col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    for (lang <- Seq("en", "de")) {
      val (in, out) = scored.collect { case (id, (l, q)) if l == lang => (id, q) }
        .partition { case (id, _) => keptIds(id) }
      if (out.nonEmpty)
        assert(out.map(_._2).max <= in.map(_._2).min,
          s"$lang: dropped a doc scoring above a kept one")
    }
  }

  test("fuzzyPairs links near-identical names only within a block") {
    val parts = Seq(
      (1L, "B1", 5, "aaa bolt"),
      (2L, "B1", 5, "aab bolt"),   // dist 1 from part 1, same block
      (3L, "B2", 5, "aaa bolt"),   // identical name, DIFFERENT block
      (4L, "B1", 5, "zzz gear nine")) // same block, far name
      .toDF("key", "brand", "size", "name")
    val got = Relational.fuzzyPairs(parts, Seq("brand", "size"), "key", "name", 2)
      .select("key_a", "key_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1)), got.mkString(","))
  }

  test("dimStats computes exact per-dimension moments") {
    val d = Seq(
      (1L, Array(1.0f, 10.0f)),
      (2L, Array(3.0f, 10.0f))).toDF("vec_id", "embedding")
    val got = Similarity.dimStats(d).orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // dim0: mean 2, var ((1+9) - 4*4/2... ) = (10 - 8)/1 = 2 → std sqrt(2)
    assert(got(0) == ((0, 2L, 2.0, math.BigDecimal(math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 1.0, 3.0)), got(0))
    // dim1 constant: stddev exactly 0 (10.0 is dec20-exact; non-exact
    // constants can cancel epsilon-negative, which the operator clamps)
    assert(got(1) == ((1, 2L, 10.0, 0.0, 10.0, 10.0)), got(1))
  }

  test("source overlap pairs near-dup docs across their sources") {
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val d = Seq(
      (1L, "en", "srcA", text),
      (2L, "en", "srcB", text),                 // near-dup of 1, other source
      (3L, "en", "srcC", "totally different words that share no shingles at all with anything"))
      .toDF("doc_id", "lang", "source", "text")
    val pairs = Dedup.jaccardPairs(d)
    val src = d.select(col("doc_id"), col("source"))
    val got = pairs
      .join(src.toDF("doc_a", "src_a"), "doc_a")
      .join(src.toDF("doc_b", "src_b"), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("a"),
        greatest(col("src_a"), col("src_b")).as("b"))
      .groupBy("a", "b").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("srcA", "srcB", 1L)), got.mkString(","))
    Caches.release(spark)
  }
}
