package graft

import graft.functions.{Deterministic, Kmv}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The KMV half of the mergeable-sketch streaming story: merge =
  * k-smallest-of-concatenation is associative AND idempotent, so KMV sits
  * with HLL on the replay-tolerant side of the delivery contract CmsSpec
  * pins for ADD-merged sketches — plus cross-implementation agreement with
  * the TopKPerGroup-built signatures of the declared text_kmv_setops path.
  */
class KmvSpec extends SparkSuite {

  import spark.implicits._

  private val K = 32
  private val items: Seq[(String, String)] =
    (1 to 400).map(i => ("a", s"w${i % 90}")) ++
      (1 to 200).map(i => ("b", s"x${i % 55}"))

  private def sigMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("streaming signature maintenance equals one batch pass") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val sigs = Kmv.signatures(input.toDF().toDF("g", "k"),
      col("g"), col("k"), K)
    val q = sigs.writeStream.format("memory").queryName("kmv_sigs")
      .outputMode("complete").start()
    try {
      input.addData(items.take(7): _*)
      q.processAllAvailable()
      input.addData(items.slice(7, 340): _*)
      input.addData(items.drop(340): _*)
      q.processAllAvailable()
      val streamed = sigMap(spark.table("kmv_sigs"))
      val batch = sigMap(Kmv.signatures(items.toDF("g", "k"),
        col("g"), col("k"), K))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("re-delivered chunks are a NO-OP (the idempotence contract CMS lacks)") {
    val replayed = items ++ items.take(123) ++ items
    val once = sigMap(Kmv.signatures(items.toDF("g", "k"),
      col("g"), col("k"), K))
    val again = sigMap(Kmv.signatures(replayed.toDF("g", "k"),
      col("g"), col("k"), K))
    assert(once == again, "replay changed a KMV signature")
  }

  test("shard merge equals the signature of the union") {
    val (l, r) = items.splitAt(217)
    val merged = sigMap(Kmv.merge(K,
      Kmv.signatures(l.toDF("g", "k"), col("g"), col("k"), K),
      Kmv.signatures(r.toDF("g", "k"), col("g"), col("k"), K)))
    val whole = sigMap(Kmv.signatures(items.toDF("g", "k"),
      col("g"), col("k"), K))
    assert(merged == whole)
  }

  test("Aggregator signatures agree with the TopKPerGroup panel path; estimate is exact below k") {
    // same hash stream through both implementations
    val h = items.toDF("g", "k")
      .select(col("g").as("lang"),
        Deterministic.md5Hash32(col("k")).as("h")).distinct()
    val viaTopK = graft.plans.TopK
      .perGroup(h, Seq("lang"), Seq(col("h").asc), K)
      .groupBy("lang").agg(sort_array(collect_list(col("h"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = sigMap(Kmv.signatures(items.toDF("g", "k"),
      col("g"), col("k"), K))
    assert(viaTopK == viaAgg)

    // below-k regime: 10 distinct keys, k = 32 → estimate must be EXACT
    val small = (1 to 200).map(i => ("s", s"v${i % 10}"))
    val est = Kmv.signatures(small.toDF("g", "k"), col("g"), col("k"), K)
      .select(Kmv.estimate(col("sig"), K)).collect().head.getDouble(0)
    assert(est == 10.0)
  }
}
