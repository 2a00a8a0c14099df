package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup (SURVEY.md §2.12 D1 under §2.10 semantics): drop
  * re-delivered events by key with state bounded by the event-time
  * watermark — the at-least-once → exactly-once repair step the reference's
  * EventBridge→Lambda hop needs but doesn't have
  * (/root/reference/health-etl/main.tf:231-252 happily re-fires the Glue job
  * for a re-uploaded object; `mode("append")` then duplicates rows,
  * glue_job_script.py:51).
  *
  * `dropDuplicatesWithinWatermark` keeps a key's state only until the
  * watermark passes it (bounded state at 100 TB); a plain streaming
  * `dropDuplicates` would grow state forever.
  */
object StreamingDedup {

  /** `df` must be a streaming DataFrame with an event-time column already
    * watermarked (`withWatermark`).
    */
  def byKey(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keyCols)
}
