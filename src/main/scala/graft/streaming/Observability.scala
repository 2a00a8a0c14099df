package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass pipeline observability via `Dataset.observe` — the Spark-native
  * replacement for the reference's CloudWatch-side job metrics (the Glue job
  * run state and Lambda logs, /root/reference/health-etl/main.tf:300-302):
  * declared data-quality metrics piggyback on whatever action consumes the
  * frame, so an ingest run reports row counts, null violations, and measure
  * bounds WITHOUT a second scan — at 100 TB a separate metrics pass is a
  * second 100 TB read.
  *
  * Two entry points, because Spark's two delivery channels differ: BATCH
  * callers pass an `org.apache.spark.sql.Observation` handle (name-based
  * observe is unreadable in batch without a listener) and read
  * `observation.get` after their action; STREAMING callers use the
  * name-based variant and read `StreamingQueryProgress.observedMetrics`
  * per micro-batch. Both ride the accumulator channel, never a job of
  * their own.
  */
object Observability {

  /** Streaming variant: metrics keyed by `name` in each micro-batch's
    * `observedMetrics`. Composable — the returned frame is `df` with
    * metrics declared, not consumed.
    */
  def withIngestMetrics(df: DataFrame, name: String,
                        nullCols: Seq[String], measure: String): DataFrame =
    df.observe(name, ingestMetrics(nullCols, measure).head,
      ingestMetrics(nullCols, measure).tail: _*)

  /** Batch variant: bind the metrics to a caller-held [[Observation]];
    * `obs.get` blocks until the first action on the returned frame
    * completes, then yields the metric row.
    */
  def withIngestMetrics(df: DataFrame, obs: org.apache.spark.sql.Observation,
                        nullCols: Seq[String], measure: String): DataFrame =
    df.observe(obs, ingestMetrics(nullCols, measure).head,
      ingestMetrics(nullCols, measure).tail: _*)

  /** Shared metric set: total rows, `<col>_nulls` per declared column,
    * min/max of `measure`.
    */
  private def ingestMetrics(nullCols: Seq[String],
                            measure: String): Seq[Column] = {
    require(nullCols.nonEmpty, "withIngestMetrics: declare at least one column")
    count(lit(1)).as("n_rows") +:
      nullCols.map(c => count(when(col(c).isNull, 1)).as(s"${c}_nulls")) :+
      min(col(measure)).as("measure_min") :+
      max(col(measure)).as("measure_max")
  }
}
