package graft

import graft.functions.Cms
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The CMS half of the mergeable-sketch streaming story (HllSpec is the
  * other): cell-wise ADD composes across shards and micro-batches, but —
  * unlike HLL's idempotent MAX — is NOT replay-tolerant, and the spec pins
  * both facts.
  */
class CmsSpec extends SparkSuite {

  import spark.implicits._

  private val items: Seq[(String, String)] =
    (1 to 300).map(i => ("a", s"w${i % 40}")) ++
      (1 to 120).map(i => ("b", s"x${i % 15}"))

  private def cellSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("streaming cell maintenance equals one batch pass under exactly-once chunking") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val cells = Cms.cells(input.toDF().toDF("g", "k"), col("g"), col("k"))
    val q = cells.writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      input.addData(items.take(13): _*)
      q.processAllAvailable()
      input.addData(items.slice(13, 250): _*)
      input.addData(items.drop(250): _*)
      q.processAllAvailable()
      val streamed = cellSet(spark.table("cms_cells"))
      val batch = cellSet(Cms.cells(items.toDF("g", "k"), col("g"), col("k")))
      assert(streamed == batch,
        s"stream-maintained cells diverged: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("shard merge equals cells of the union; estimates never undercount") {
    val (l, r) = items.splitAt(201)
    val merged = Cms.merge(
      Cms.cells(l.toDF("g", "k"), col("g"), col("k")),
      Cms.cells(r.toDF("g", "k"), col("g"), col("k")))
    val whole = Cms.cells(items.toDF("g", "k"), col("g"), col("k"))
    assert(cellSet(merged) == cellSet(whole))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Cms.estimate(whole,
        items.distinct.toDF("g", "k"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    truth.foreach { case ((g, k), n) =>
      assert(est((g, k)) >= n, s"CMS undercounted ($g,$k): ${est((g, k))} < $n")
    }
  }

  test("idempotent foreachBatch sink: stream ≡ batch even under a replayed micro-batch") {
    // The runnable template for the exactly-once requirement: per-batch
    // deltas keyed by batchId, overwrite-on-replay (Cms.upsertBatchCells),
    // wired through the same foreachBatch surface a production job uses.
    import org.apache.spark.sql.types._
    val src = java.nio.file.Files.createTempDirectory("cms_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cms_ckpt").toString
    val store = java.nio.file.Files.createTempDirectory("cms_store").toString
    val (l, r) = items.splitAt(201)
    def csv(rows: Seq[(String, String)], name: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(src, name),
        "g,k\n" + rows.map { case (g, k) => s"$g,$k" }.mkString("\n"))
    csv(l, "a.csv")
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("k", StringType)))
    var lastBatch: (org.apache.spark.sql.DataFrame, Long) = null
    def handler(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      // persist the batch rows so the deliberate replay below re-sees the
      // same data (the real runtime re-reads them from the checkpoint)
      val pinned = df.localCheckpoint(true)
      lastBatch = (pinned, id)
      Cms.upsertBatchCells(pinned, id, store, col("g"), col("k"))
    }
    val q1 = streaming.StreamingIngest.startForeachBatch(
      spark, src, ckpt, schema)(handler)
    q1.awaitTermination()
    csv(r, "b.csv")
    val q2 = streaming.StreamingIngest.startForeachBatch(
      spark, src, ckpt, schema)(handler)
    q2.awaitTermination()
    // simulate at-least-once: the sink sees the LAST micro-batch twice
    handler(lastBatch._1, lastBatch._2)
    val streamed = cellSet(Cms.readCells(spark, store))
    val batch = cellSet(Cms.cells(items.toDF("g", "k"), col("g"), col("k")))
    assert(streamed == batch,
      s"replayed micro-batch leaked into cells: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
  }

  test("re-delivery inflates cells but keeps the one-sided guarantee (the non-idempotence contract)") {
    val replayed = items ++ items.take(57) // at-least-once: a replayed chunk
    val dup = Cms.cells(replayed.toDF("g", "k"), col("g"), col("k"))
    val clean = Cms.cells(items.toDF("g", "k"), col("g"), col("k"))
    // every replayed key's cells strictly grew — ADD is not idempotent...
    val grewCells = dup.withColumnRenamed("cnt", "dcnt")
      .join(clean, Seq("g", "r", "bucket"))
      .filter(col("dcnt") < col("cnt")).count()
    assert(grewCells == 0, "a cell shrank under re-delivery")
    assert(cellSet(dup) != cellSet(clean), "re-delivery should inflate cells")
    // ...but errors stay one-sided: estimates still never undercount truth
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Cms.estimate(dup, items.distinct.toDF("g", "k"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    truth.foreach { case ((g, k), n) =>
      assert(est((g, k)) >= n, s"guarantee broke under replay for ($g,$k)")
    }
  }
}
