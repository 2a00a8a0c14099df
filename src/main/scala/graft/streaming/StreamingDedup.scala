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

  /** Streaming incremental near-dup flagging: every arriving micro-batch of
    * documents is scored against the standing corpus — the streaming twin of
    * the per-ingest-cycle batch job. The corpus posting index is built and
    * persisted ONCE ([[graft.operators.Dedup.buildCorpusIndex]]) before the
    * stream starts; each micro-batch only explodes its own shingles and
    * probes the cached index ([[graft.operators.Dedup.probeNearDups]]), so
    * per-cycle cost is linear in the BATCH — a 1-row batch never pays a
    * corpus scan. `foreachBatch` is the right harness here (not a
    * record-at-a-time transform): the per-batch computation is a
    * multi-stage batch plan, and foreachBatch hands each micro-batch to
    * exactly that plan while the stream supplies arrival semantics,
    * checkpointing and retries.
    *
    * The index owns its caches (outside the [[graft.Caches]] registry, so
    * other operations' boundary releases can't evict a live stream's
    * index); pass a prebuilt index to share it across streams, and call
    * [[graft.operators.Dedup.CorpusIndex.release]] after stopping the
    * query.
    */
  def nearDupsVsCorpus(stream: DataFrame, idx: graft.operators.Dedup.CorpusIndex)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Dedup.probeNearDups(idx, batch), batchId)
    }

  /** Convenience overload: builds (and owns) the index from a corpus frame.
    * The index stays cached for the stream's lifetime; long-lived apps that
    * need to reclaim it should use the index-taking overload.
    */
  def nearDupsVsCorpus(stream: DataFrame, corpus: DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    nearDupsVsCorpus(stream, graft.operators.Dedup.buildCorpusIndex(corpus))(sink)
}
