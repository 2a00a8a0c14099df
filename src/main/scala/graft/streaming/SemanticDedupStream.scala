package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.VectorKernels

/** Streaming SEMANTIC near-dup suppression (SURVEY.md §2.12 D3/D4 under
  * §2.10 semantics) — the arrival-time twin of the batch SemDeDup path
  * (`dedup_semantic_clusters_scaled`): each arriving embedding is admitted
  * or suppressed against the recently-seen corpus, deciding AT INGEST
  * whether a vector adds information — the dedup a training-data firehose
  * runs before paying storage/tokenization for near-copies.
  *
  * Shape: the 64 seed-42 sign bits (ONE [[VectorKernels.abuckets]] kernel
  * call at the fixed 4×16 width — the `sim_hamming_topk` signature) give a
  * 16-bit BLOCKING key (band 0's bucket) and a 64-bit sketch; state lives
  * per bucket in the state store (the same hash-partitioned layout a
  * groupBy would use, no driver state) as the bucket's recently-admitted
  * (id, expiry, sketch) entries, and an arrival is suppressed when any
  * in-state sketch is within [[HammingMax]] bits (ties broken by smallest
  * admitted id). Suppressions reference the admitted original, so the
  * output is also the streaming edge list of the near-dup graph.
  *
  * Bounded state, the §2.10 contract: entries expire `ttlMs` after their
  * event time — enforced against each ARRIVING row's event time during
  * matching (so the decision function is watermark-independent and
  * batch-replayable: the `dedup_semantic_stream_replay` oracle row) — and
  * are additionally pruned against the moving watermark on every group
  * invocation; an event-time timeout clears a bucket whose entries have
  * all expired, so dead buckets leave the store. Recall matches ONE LSH
  * band (the blocking key) times the Hamming test — the batch ladder's
  * measured single-band regime; a deployment wanting OR-construction
  * recall runs the same operator keyed per band and intersects the
  * suppress decisions (union of admit edges), exactly the banded trade
  * SURVEY §6 prices for the batch path.
  */
object SemanticDedupStream {

  /** Signature row: the blocking bucket `b0` IS word `s0` (band 0). */
  final case class SigRow(vec_id: Long, ts: Timestamp,
                          s0: Long, s1: Long, s2: Long, s3: Long)

  /** One admitted entry retained in a bucket's state. */
  final case class Entry(vec_id: Long, expiryMs: Long,
                         s0: Long, s1: Long, s2: Long, s3: Long)

  final case class BucketState(entries: List[Entry])

  /** Admit/suppress decision for one arrival (is_dup=false ⇒ admitted;
    * dup_of/hamming are −1 sentinels on admits).
    */
  final case class Decision(vec_id: Long, is_dup: Boolean,
                            dup_of: Long, hamming: Int)

  /** ≤ this many differing sign bits (of 64) counts as a near-duplicate —
    * sign-agreement 58/64 ≈ cosine ≥ ~0.96 under the hyperplane bound.
    */
  val HammingMax = 6

  private def hamming(e: Entry, r: SigRow): Int =
    java.lang.Long.bitCount(e.s0 ^ r.s0) + java.lang.Long.bitCount(e.s1 ^ r.s1) +
      java.lang.Long.bitCount(e.s2 ^ r.s2) + java.lang.Long.bitCount(e.s3 ^ r.s3)

  /** Project (vec_id, ts, embedding) to signature rows — the kernel runs
    * map-side; no shuffle until the keyed state stage.
    */
  def signatures(vecs: DataFrame): Dataset[SigRow] = {
    val s = vecs.sparkSession
    import s.implicits._
    VectorKernels.register(s)
    vecs.select(col("vec_id"), col("ts"),
        VectorKernels.abuckets(col("embedding"), lit(16L), 4, 16).as("sig"))
      .select(col("vec_id"), col("ts"), col("sig").getItem(0).as("s0"),
        col("sig").getItem(1).as("s1"), col("sig").getItem(2).as("s2"),
        col("sig").getItem(3).as("s3"))
      .as[SigRow]
  }

  /** Suppress near-dups over a (possibly streaming) signature Dataset.
    * Streaming: pair with `withWatermark("ts", …)` upstream; `streaming =
    * false` runs the same function in one batch pass (no timeouts fire —
    * the StatefulSessions convention).
    */
  def suppress(rows: Dataset[SigRow], ttlMs: Long = 10 * 60 * 1000L,
               streaming: Boolean = true): Dataset[Decision] = {
    val s = rows.sparkSession
    import s.implicits._
    rows.groupByKey(_.s0)
      .flatMapGroupsWithState[BucketState, Decision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processBucket(ttlMs, streaming))
  }

  /** Fold a bucket's arrivals (event-time then id order — deterministic
    * under replay) into its state, emitting one decision per arrival.
    */
  def processBucket(ttlMs: Long, streaming: Boolean)(
      bucket: Long, rows: Iterator[SigRow],
      state: GroupState[BucketState]): Iterator[Decision] = {
    val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MinValue
    var entries = state.getOption.map(_.entries).getOrElse(Nil)
      .filter(_.expiryMs > wm)
    if (!rows.hasNext) {
      // invoked by timeout: everything live re-arms, else the bucket dies
      if (entries.isEmpty) state.remove()
      else { state.update(BucketState(entries)); arm(state, entries, streaming) }
      return Iterator.empty
    }
    val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id))
    val out = sorted.map { r =>
      // event-time TTL (r16 ADVICE): an entry expires ttlMs after ITS
      // event time regardless of watermark lag — prune against the
      // arriving row's event time so an entry older than ttl never
      // suppresses a later arrival (batch mode, where wm = MinValue, and
      // micro-batches spanning > ttlMs both hit this). Rows are ts-sorted,
      // so the prune is monotone within the invocation.
      entries = entries.filter(_.expiryMs > r.ts.getTime)
      val near = entries.filter(e => hamming(e, r) <= HammingMax)
      if (near.nonEmpty) {
        val best = near.minBy(e => (hamming(e, r), e.vec_id))
        Decision(r.vec_id, is_dup = true, best.vec_id, hamming(best, r))
      } else {
        entries ::= Entry(r.vec_id, r.ts.getTime + ttlMs, r.s0, r.s1, r.s2, r.s3)
        Decision(r.vec_id, is_dup = false, -1L, -1)
      }
    }
    if (entries.isEmpty) state.remove()
    else { state.update(BucketState(entries)); arm(state, entries, streaming) }
    out.iterator
  }

  /** Event-time timeout at the bucket's latest expiry (must sit past the
    * current watermark; clamp for late restarts).
    */
  private def arm(state: GroupState[BucketState], entries: List[Entry],
                  streaming: Boolean): Unit =
    if (streaming) {
      val at = math.max(entries.map(_.expiryMs).max,
        state.getCurrentWatermarkMs() + 1)
      state.setTimeoutTimestamp(at)
    }
}
