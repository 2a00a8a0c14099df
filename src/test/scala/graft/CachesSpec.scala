package graft

import org.apache.spark.storage.StorageLevel

/** The cache registry is scoped per SparkSession: one driver's boundary
  * release must not evict frames a sibling session is still using.
  */
class CachesSpec extends SparkSuite {

  test("release on one session leaves a sibling session's frames cached") {
    val a = spark.newSession()
    val b = spark.newSession()
    // distinct plans, not just distinct sessions: the CacheManager is shared
    // across sessions and matches by sameResult, so two equal range plans
    // would alias each other's cache entry and mask what's under test
    val fa = Caches.track(a.range(10).toDF("x"))
    val fb = Caches.track(b.range(20).toDF("y"))
    fa.count(); fb.count()
    assert(fa.storageLevel != StorageLevel.NONE)
    assert(fb.storageLevel != StorageLevel.NONE)

    Caches.release(a)
    assert(fa.storageLevel == StorageLevel.NONE, "released session not evicted")
    assert(fb.storageLevel != StorageLevel.NONE, "sibling session was evicted")

    Caches.release(b)
    assert(fb.storageLevel == StorageLevel.NONE)
  }

  test("releaseAll sweeps every session's bucket (forgotten-release escape hatch)") {
    val a = spark.newSession()
    val b = spark.newSession()
    val fa = Caches.track(a.range(30).toDF("x"))
    val fb = Caches.track(b.range(40).toDF("y"))
    fa.count(); fb.count()
    Caches.releaseAll()
    assert(fa.storageLevel == StorageLevel.NONE)
    assert(fb.storageLevel == StorageLevel.NONE)
    // idempotent on an empty registry
    Caches.releaseAll()
  }

  test("adopt registers an externally persisted frame for its own session only") {
    val a = spark.newSession()
    val pre = a.range(5).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    Caches.adopt(pre)
    pre.count()
    // releasing an unrelated session is a no-op for it
    Caches.release(spark)
    assert(pre.storageLevel != StorageLevel.NONE)
    Caches.release(a)
    assert(pre.storageLevel == StorageLevel.NONE)
  }

  test("memo builds once per (session, key), survives release, falls to releaseAll") {
    var builds = 0
    def build() = { builds += 1; spark.range(7).toDF("x") }
    val f1 = Caches.memo(spark, "memo-spec-key")(build())
    assert(f1.count() == 7 && builds == 1)
    // the per-operation release boundary must NOT evict the memo
    Caches.release(spark)
    val f2 = Caches.memo(spark, "memo-spec-key")(build())
    assert(builds == 1, "memo rebuilt despite being cached")
    assert(f2.count() == 7)
    // a different key builds independently
    Caches.memo(spark, "memo-spec-key-2")(build())
    assert(builds == 2)
    Caches.releaseAll()
    Caches.memo(spark, "memo-spec-key")(build())
    assert(builds == 3, "releaseAll should clear memos")
    Caches.releaseAll()
  }
}
