package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-session registry for DataFrames persisted inside operator builders.
  *
  * Builders return lazy DataFrames, so they cannot unpersist inline — the
  * consumer hasn't materialized anything when the builder returns, and an
  * eager unpersist would silently undo the persist. Instead every builder
  * routes its persists through [[track]], and batch drivers (Bench, Verify)
  * call [[release]] once the query's result is materialized. A long-lived
  * session (a Bench run touches the Jaccard family six times) then holds no
  * stale cached RDDs between queries.
  *
  * The registry is keyed by the owning `SparkSession` (taken from the frame
  * itself), so a driver hosting several sessions — a batch job and a
  * notebook, or two concurrent pipelines on separate `newSession()` clones —
  * can release at its own operation boundaries without evicting frames a
  * sibling session is still computing over. Within ONE session the contract
  * is unchanged and single-operation: interleave two tracked operations on
  * the same session and a boundary release frees both (run concurrent
  * pipelines on `newSession()` clones, which share the SparkContext but not
  * the registry bucket).
  *
  * CONTRACT for library consumers: a long-lived session that calls the
  * tracking operators must call [[release]] at its own operation
  * boundaries, exactly as Bench/Verify do. Spark's SQL cache
  * (`CacheManager`) holds cached plans by value, not by reference — an
  * unreleased `df.persist()` is never reclaimed by GC with or without this
  * registry — so the registry adds no new leak, it adds the handle that
  * makes the existing one releasable without tearing down the whole cache
  * (`spark.catalog.clearCache`) or the session.
  */
object Caches {
  private val tracked =
    scala.collection.mutable.Map.empty[SparkSession, scala.collection.mutable.ArrayBuffer[DataFrame]]

  private def bucket(s: SparkSession) =
    tracked.getOrElseUpdate(s, scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** Persist `df` and remember it for its session's next [[release]]. */
  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      bucket(df.sparkSession) += df
      df.persist(level)
    }

  /** Remember an ALREADY-persisted `df` for its session's next [[release]]
    * without re-persisting (avoids the "already cached" warning) — for
    * structures that manage their own persistence (e.g. a
    * [[graft.operators.Dedup.CorpusIndex]]) when used inside a
    * batch-driver-scoped operation.
    */
  def adopt(df: DataFrame): DataFrame =
    synchronized { bucket(df.sparkSession) += df; df }

  /** Unpersist (non-blocking) everything tracked under `spark` since its
    * last release. Frames tracked by other sessions are untouched.
    */
  def release(spark: SparkSession): Unit = synchronized {
    tracked.remove(spark).foreach(_.foreach(_.unpersist(false)))
  }

  // thunk-valued so the (possibly multi-second) eager localCheckpoint job
  // never runs under a map lock: computeIfAbsent installs a lazy cell in
  // O(1), and the Spark job runs on first force, serialized per KEY by the
  // lazy val's own monitor — a concurrent session's track/release/memo on
  // other keys proceeds instead of blocking for the whole build
  private val memos = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), () => DataFrame]()

  /** Memoize a SMALL deterministic frame (model weights, centroids, a
    * distinct-edge graph substrate — orders of magnitude below the fact
    * tables it derives from; never a fact table itself) across the
    * operation boundaries of one session: the first call materializes `build` eagerly via
    * `localCheckpoint` (lineage truncated, partitions pinned in block
    * storage) and every later call for the same (session, key) reuses the
    * pinned frame. Unlike [[track]]ed frames, memos deliberately SURVIVE
    * [[release]] — they are the cross-query carry that keeps a batch
    * session from re-deriving one model per evaluation query (the GD-eval
    * family re-trained the identical weights four times per bench pass
    * before this) — and fall only with [[releaseAll]] or session stop.
    * The builder must be deterministic: callers stay self-contained for
    * correctness because reuse is value-identical to recomputing. The key
    * must encode every input the build depends on (e.g. the data dir).
    * `localCheckpoint` is executor-local (not fault-tolerant); on executor
    * loss the worst case is rebuilding a tiny frame, which is exactly the
    * no-memo baseline.
    */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val cell = memos.computeIfAbsent((spark, key), _ => {
      lazy val df = build.localCheckpoint(true)
      () => df
    })
    cell()
  }

  /** Observability/test hook: the memo keys currently installed for
    * `spark` (installed ≠ forced — a lazy cell counts once `memo` was
    * called for the key, which is exactly the "this code path reads the
    * memo" signal Round16Spec pins the Bench consumer list against).
    */
  def memoKeys(spark: SparkSession): Set[String] = {
    val it = memos.keys()
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasMoreElements) {
      val (s, k) = it.nextElement()
      if (s eq spark) out += k
    }
    out.toSet
  }

  /** Test hook: drop `spark`'s memo cells (references only — the
    * ContextCleaner reclaims any forced localCheckpoint blocks), so a spec
    * can observe which keys ONE query installs on a long-lived session.
    */
  def dropMemos(spark: SparkSession): Unit = dropMemos(spark, "")

  /** Drop only `spark`'s memo cells whose key starts with `prefix` — the
    * targeted form Bench's best-of-2 prewarm timing needs: re-measuring the
    * lsh memo build must not also evict an already-paid pq memo (or vice
    * versa), which would silently reattribute one line item's cost onto
    * whichever query forces the evicted memo first.
    */
  def dropMemos(spark: SparkSession, prefix: String): Unit = {
    val it = memos.keys()
    while (it.hasMoreElements) {
      val key = it.nextElement()
      if ((key._1 eq spark) && key._2.startsWith(prefix)) memos.remove(key)
    }
  }

  /** Unpersist everything tracked under EVERY session — the escape hatch
    * for a driver hosting many short-lived sessions whose per-session
    * [[release]] calls it can't guarantee (a forgotten release would
    * otherwise pin that session's bucket, and the session itself, for the
    * driver lifetime). A weak-keyed map would not fix that: each tracked
    * DataFrame strongly references its own SparkSession, so the buckets
    * would pin the weak keys regardless.
    */
  def releaseAll(): Unit = synchronized {
    tracked.valuesIterator.foreach(_.foreach(_.unpersist(false)))
    tracked.clear()
    // memoized frames hold localCheckpoint RDDs; dropping the references
    // lets the ContextCleaner reclaim their blocks
    memos.clear()
  }
}
