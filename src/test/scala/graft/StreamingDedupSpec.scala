package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.Compaction
import graft.streaming.StatefulSessions.Ev
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSuite {

  test("streaming dedup drops re-delivered keys across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = StreamingDedup.byKey(
      input.toDF().withWatermark("ts", "10 minutes"), Seq("user_id", "ts"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(min: Int) = new Timestamp(3600000L + min * 60000L)
    try {
      input.addData(Ev(1, t(0), "view", 1.0), Ev(1, t(0), "view", 1.0)) // in-batch dup
      q.processAllAvailable()
      input.addData(Ev(1, t(0), "view", 1.0))                            // redelivery
      input.addData(Ev(2, t(1), "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 2, rows.mkString(","))
    } finally q.stop()
  }

  test("compaction rewrites many small files into the expected count, rows intact") {
    val src = Files.createTempDirectory("graft-smallfiles").toString
    val out = Files.createTempDirectory("graft-compacted").toString
    val orders = Tables.load(spark, sfDir, "orders")
    orders.repartition(32).write.mode("overwrite").parquet(src)
    val smallFiles = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 32)
    val totalBytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Compaction.compact(spark, src, out, targetFileBytes = totalBytes / 3)
    val outFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(n >= 3 && n <= 4, s"n=$n")
    assert(outFiles == n, s"outFiles=$outFiles n=$n")
    assert(spark.read.parquet(out).count() == orders.count())
  }
}
