package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass pipeline observability via `Dataset.observe` — the Spark-native
  * replacement for the reference's CloudWatch-side job metrics (the Glue job
  * run state and Lambda logs, /root/reference/health-etl/main.tf:300-302):
  * declared data-quality metrics piggyback on whatever action consumes the
  * frame, so an ingest run reports row counts, null violations, and measure
  * bounds WITHOUT a second scan — at 100 TB a separate metrics pass is a
  * second 100 TB read.
  *
  * Batch consumers read the result through `org.apache.spark.sql
  * .Observation`; streaming consumers get the same metrics per micro-batch
  * in `StreamingQueryProgress.observedMetrics` (keyed by `name`) — both are
  * driven by the accumulator channel, not a job of their own.
  */
object Observability {

  /** Attach ingest-gate metrics to `df`: total rows, per-column null
    * counts (`<col>_nulls`), and min/max of `measure`. Composable — the
    * returned frame is `df` with metrics declared, not consumed.
    */
  def withIngestMetrics(df: DataFrame, name: String,
                        nullCols: Seq[String], measure: String): DataFrame = {
    require(nullCols.nonEmpty, "withIngestMetrics: declare at least one column")
    val metrics =
      count(lit(1)).as("n_rows") +:
        nullCols.map(c => count(when(col(c).isNull, 1)).as(s"${c}_nulls")) :+
        min(col(measure)).as("measure_min") :+
        max(col(measure)).as("measure_max")
    df.observe(name, metrics.head, metrics.tail: _*)
  }
}
