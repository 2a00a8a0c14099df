package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames persisted inside operator builders.
  *
  * Builders return lazy DataFrames, so they cannot unpersist inline — the
  * consumer hasn't materialized anything when the builder returns, and an
  * eager unpersist would silently undo the persist. Instead every builder
  * routes its persists through [[track]], and batch drivers (Bench, Verify)
  * call [[release]] once the query's result is materialized. A long-lived
  * session (a Bench run touches the Jaccard family six times) then holds no
  * stale cached RDDs between queries.
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
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for the next [[release]]. */
  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      tracked += df
      df.persist(level)
    }

  /** Remember an ALREADY-persisted `df` for the next [[release]] without
    * re-persisting (avoids the "already cached" warning) — for structures
    * that manage their own persistence (e.g. a
    * [[graft.operators.Dedup.CorpusIndex]]) when used inside a
    * batch-driver-scoped operation.
    */
  def adopt(df: DataFrame): DataFrame = synchronized { tracked += df; df }

  /** Unpersist (non-blocking) everything tracked since the last release. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }
}
