package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (SURVEY.md §2.10 extension): the
  * attribution shape — match each right-stream event (e.g. a conversion) to
  * left-stream events (e.g. impressions) for the same key within a bounded
  * event-time window after the impression.
  *
  * Scale semantics: both sides carry watermarks and the join predicate
  * bounds event-time distance, so Spark provably expires buffered state —
  * unbounded stream-stream joins would hold both streams forever. State per
  * key is O(events inside the interval), shuffled by the join key like any
  * equi-join.
  */
object StreamJoin {

  /** `left`/`right`: streaming frames with `ts` event-time columns already
    * watermarked. Emits (key, left row ts, right row ts) pairs where the
    * right event lands in [left.ts, left.ts + horizon].
    *
    * `joinType` "left_outer" adds the no-match rows (right columns null) —
    * emitted only once the watermark proves no in-horizon match can still
    * arrive, which is exactly the "unconverted impressions" feed an
    * attribution pipeline needs.
    */
  def interval(left: DataFrame, right: DataFrame, key: String,
               horizon: String = "10 minutes",
               joinType: String = "inner"): DataFrame = {
    val l = left.toDF(left.columns.map(c => if (c == key) key else s"l_$c").toIndexedSeq: _*)
    val r = right.toDF(right.columns.map(c => if (c == key) s"r_$key" else s"r_$c").toIndexedSeq: _*)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .drop(s"r_$key")
  }

  /** Stream-static enrichment: join a streaming frame against a batch
    * dimension on `keys` — the standard lookup-table shape (events ×
    * user/catalog dims). Spark re-plans the static side per micro-batch, so
    * a dim under the broadcast threshold ships as a broadcast hash join and
    * the stream side never shuffles; no state store is involved (unlike
    * stream-stream joins) and left_outer needs no watermark. The dim frame
    * is re-read each micro-batch — at 100 TB keep it a pruned/compact table
    * (or a cached view refreshed on dimension-change cadence).
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             joinType: String = "left_outer"): DataFrame =
    stream.join(dim, keys, joinType)
}
