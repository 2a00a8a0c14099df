package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe pricing [[streaming.SemanticDedupStream]]'s SUPPRESSION
  * RECALL at scale (r17 verdict item 6): of the arrivals that SHOULD be
  * suppressed under the operator's own contract (an earlier, still-live
  * arrival within [[streaming.SemanticDedupStream.HammingMax]] = 6 of 64
  * sign bits — cosine ≳ 0.96), what fraction does the single-band-0
  * blocking key actually catch?  Ground truth exploits the [[ScaleUp]]
  * corpus structure: near-dup pairs are same-source replica pairs
  * (clone mode draws ±0.05 noise; organic mode draws fresh full-σ
  * vectors, so the truth set measures EMPTY — the regime statement:
  * a cos-0.5 organic neighborhood has NO pairs inside the cos-0.96
  * suppression contract, so the ladder's organic-recall collapse is a
  * RETRIEVAL statement, not a suppression gap). Also prints the 4-band
  * OR-keying upper bound (the deployment convention the operator doc
  * names: run keyed per band, union suppressions).
  *
  * `args: dir` — arrivals are scheduled rep-major (every same-source pair
  * arrives ≥ nSources s apart, TTL 10⁹ s covers the window), decisions
  * come from the REAL `suppress` fold in batch mode (the declared
  * `dedup_semantic_stream_replay`'s machinery). Round18Spec floors the
  * same [[measure]] on a deterministic in-memory clone amplification.
  */
object SemStreamProbe {

  /** (suppressible, singleband_caught, or4_caught, b0_collide, or4_collide)
    * over a (vec_id, embedding) frame whose same-source near-dups live at
    * id stride `stride` (the ScaleUp layout).
    *
    * Truth-set definition (deliberate, r18 ADVICE): an arrival counts as
    * suppressible when ANY earlier same-source arrival sits within
    * HammingMax — including earlier arrivals the operator itself
    * suppressed. That is the right denominator for a RECALL number: it is
    * operator-independent (the alternative — only still-admitted
    * predecessors — makes the truth set depend on the very decisions under
    * measurement, so two operators would be scored against different
    * denominators), and it matches the collision bounds printed beside it,
    * which are also any-predecessor quantities. The operator can still
    * reach 1.0 on it: a suppressed predecessor within HammingMax of a
    * later arrival implies its own admitted original is within 2·HammingMax
    * — and on the clone corpora the whole same-source cluster sits within
    * the contract, so the chain is catchable in practice (measured: the
    * OR-keyed fold reads ≥0.95 against this denominator).
    */
  def measure(spark: SparkSession, e: DataFrame,
              stride: Long): (Long, Long, Long, Long, Long) = {
    val nSrc = e.select(max(pmod(col("vec_id"), lit(stride)))).collect()
      .head.getLong(0) + 1
    val arr = e.select(col("vec_id"),
      timestamp_millis(lit(3600000L) +
        (expr(s"vec_id DIV ${stride}L") * lit(nSrc) +
          pmod(col("vec_id"), lit(stride))) * lit(1000L)).as("ts"),
      col("embedding"))
    val sig = streaming.SemanticDedupStream.signatures(arr).localCheckpoint(true)
    // the real operator folds, batch mode (ttl >> the schedule's span):
    // single-band-0 keying and the r19 4-band-OR keying side by side
    val dec = streaming.SemanticDedupStream
      .suppress(sig, ttlMs = 1000000000000L, streaming = false)
      .toDF().localCheckpoint(true)
    val decOr = streaming.SemanticDedupStream
      .suppressOr(sig, ttlMs = 1000000000000L, streaming = false)
      .localCheckpoint(true)
    // ground truth: same-source pairs within HammingMax, earlier → later
    val s = sig.toDF()
    def side(p: String) = s.select(
      col("vec_id").as(s"${p}_id"), col("ts").as(s"${p}_ts"),
      pmod(col("vec_id"), lit(stride)).as(s"${p}_src"),
      col("s0").as(s"${p}0"), col("s1").as(s"${p}1"),
      col("s2").as(s"${p}2"), col("s3").as(s"${p}3"))
    val ham = bit_count(col("a0").bitwiseXOR(col("b0"))) +
      bit_count(col("a1").bitwiseXOR(col("b1"))) +
      bit_count(col("a2").bitwiseXOR(col("b2"))) +
      bit_count(col("a3").bitwiseXOR(col("b3")))
    val pairs = side("a").join(side("b"),
        col("a_src") === col("b_src") && col("a_ts") < col("b_ts"))
      .filter(ham <= streaming.SemanticDedupStream.HammingMax)
      .select(col("b_id"),
        (col("a0") === col("b0")).as("w0"),
        (col("a0") === col("b0") || col("a1") === col("b1") ||
          col("a2") === col("b2") || col("a3") === col("b3")).as("wor"))
      .groupBy(col("b_id"))
      .agg(max(col("w0")).as("w0"), max(col("wor")).as("wor"))
      .localCheckpoint(true)
    val truth = pairs.count()
    val blockB0 = pairs.filter(col("w0")).count()
    val blockOr = pairs.filter(col("wor")).count()
    val caught = pairs.join(dec.filter(col("is_dup")),
      pairs("b_id") === dec("vec_id"), "left_semi").count()
    val caughtOr = pairs.join(decOr.filter(col("is_dup")),
      pairs("b_id") === decOr("vec_id"), "left_semi").count()
    (truth, caught, caughtOr, blockB0, blockOr)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus).toInt
    val spark = Sessions.builder(s"local[$cpus]", width)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, dir, "embeddings")
    val (truth, caught, caughtOr, blockB0, blockOr) = measure(spark, e, 1L << 40)
    def ratio(a: Long, b: Long) = if (b == 0) Double.NaN else a.toDouble / b
    println(f"[semprobe] n=${e.count()} suppressible=$truth " +
      f"operator_caught=$caught recall=${ratio(caught, truth)}%.3f " +
      f"or4_caught=$caughtOr recall_or4=${ratio(caughtOr, truth)}%.3f " +
      f"b0_collide=$blockB0 (${ratio(blockB0, truth)}%.3f) " +
      f"or4_collide=$blockOr (${ratio(blockOr, truth)}%.3f)")
    spark.stop()
  }
}
