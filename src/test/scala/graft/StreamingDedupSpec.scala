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

  test("streaming incremental near-dups: each micro-batch scored against the corpus only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "one two three four five six seven")).toDF("doc_id", "lang", "text")
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = graft.streaming.StreamingDedup.nearDupsVsCorpus(
      input.toDF().toDF("doc_id", "lang", "text"), corpus) { (flags, batchId) =>
        got.synchronized {
          got ++= flags.collect().map(r => (r.getLong(0), r.getLong(1), batchId))
        }
      }.start()
    try {
      input.addData((10L, "en", "alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
      input.addData(
        (11L, "en", "one two three four five six seven"),
        (12L, "en", "entirely novel content matching nothing at all"))
      q.processAllAvailable()
      // batch 0 flags 10→1; batch 1 flags 11→2; 12 matches nothing; and a
      // doc never collides with an earlier BATCH (corpus-only scoring)
      assert(got.toSet == Set((10L, 1L, 0L), (11L, 2L, 1L)), got.toString)
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

  test("partition expiry drops exactly the below-cutoff partitions, reads survive") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-expire").toString
    Seq(("2024-01-01", 1), ("2024-02-01", 2), ("2024-03-01", 3))
      .toDF("ingest_date", "v")
      .write.partitionBy("ingest_date").mode("overwrite").parquet(dir)
    val dropped = Compaction.expirePartitions(dir, "ingest_date", "2024-02-01")
    assert(dropped == Seq("2024-01-01"), dropped.toString)
    val back = spark.read.parquet(dir)
    assert(back.select("v").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    // idempotent: a second sweep at the same cutoff drops nothing
    assert(Compaction.expirePartitions(dir, "ingest_date", "2024-02-01").isEmpty)
  }
}
