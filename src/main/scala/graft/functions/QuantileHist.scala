package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-bin mergeable quantile histogram — the QUANTILE member of the
  * mergeable-sketch family ([[Hll]] = cardinality, [[Cms]] = counts,
  * [[Kmv]] = set algebra, SpaceSaving = top-k, Bloom = membership): a
  * constant `bins`-cell count histogram per group over a declared value
  * domain [lo, hi). Merge = cell-wise ADD (associative/commutative), so
  * shards/days/micro-batches compose without rescanning raw data and ONE
  * `groupBy.count` maintains it under Structured Streaming — the same
  * streaming/merge contract as [[Cms.cells]], including the CMS
  * non-idempotence caveat (ADD is not replay-tolerant: use the
  * exactly-once input path or the [[Cms.upsertBatchCells]]-style
  * idempotent per-batch sink).
  *
  * Accuracy contract (the agg_approx_distinct hard-bound stance): the
  * estimate lies INSIDE the bin containing the target-rank order
  * statistic — a deterministic RANK guarantee (rank error ≤ that bin's
  * occupancy) from exact integer cell counts, not a probabilistic band.
  * In the VALUE domain this means |est − x₍⌈qn⌉₎| ≤ binWidth always;
  * distance to the ±1-rank interpolated exact quantile is additionally
  * bounded by the local order-statistic gap (tight on dense metrics, the
  * monitoring case — the declared query checks a 2·binWidth band that
  * such data satisfies). Unlike GK/KLL the memory is not rank-adaptive:
  * right for metrics with a known bounded domain (latencies, prices,
  * scores); an unbounded domain needs a log-scaled binning on top.
  *
  * Determinism: cells are exact longs; the estimate is a closed-form
  * IEEE expression of exact counts (one divide, one multiply-add),
  * mirrored literally in the DuckDB oracle.
  */
object QuantileHist {

  /** The (group, bin, cnt) cell table. One aggregation — runs unchanged on
    * a streaming frame; constant `bins` cells per group at any corpus
    * size. Values outside [lo, hi) clamp into the edge bins (they count,
    * with degraded accuracy at the edges — the standard histogram
    * convention).
    */
  def cells(df: DataFrame, group: Column, value: Column,
            lo: Double = 0.0, hi: Double = 512.0, bins: Int = 256): DataFrame = {
    val w = (hi - lo) / bins
    df.select(group.as("g"), value.cast("double").as("v"))
      .select(col("g"),
        least(greatest(floor((col("v") - lo) / w).cast("int"), lit(0)),
          lit(bins - 1)).as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Merge cell tables from shards/batches: cell-wise add. */
  def merge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy("g", "bin").agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates per group for the given `qs`: the cumulative walk
    * runs in a window PARTITIONED BY GROUP over the ≤ `bins`-row cell
    * frame (bounded by construction, never by data volume); the estimate
    * interpolates the target rank inside its bin.
    */
  def quantiles(cellTable: DataFrame, qs: Seq[Double],
                lo: Double = 0.0, hi: Double = 512.0,
                bins: Int = 256): DataFrame = {
    val w = (hi - lo) / bins
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = cellTable
      .withColumn("cb", coalesce(sum(col("cnt")).over(win), lit(0L)))
    val tot = cellTable.groupBy("g").agg(sum(col("cnt")).as("n"))
    val s = cellTable.sparkSession
    import s.implicits._
    val qf = qs.toDF("q")
    // target rank = ceil(q·n) clamped to [1, n]; the first bin whose
    // cumulative count reaches it holds the estimate
    cum.join(broadcast(tot), "g").crossJoin(broadcast(qf))
      .withColumn("tr", greatest(least(ceil(col("q") * col("n")), col("n")), lit(1L)))
      .filter(col("cb") < col("tr") && col("cb") + col("cnt") >= col("tr"))
      .select(col("g"), col("q"), col("n"),
        (lit(lo) + lit(w) * (col("bin").cast("double") +
          (col("tr") - col("cb")).cast("double") / col("cnt").cast("double")))
          .as("est"))
  }
}
