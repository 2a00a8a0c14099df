package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The batch `window()` aggregates of EventWindows running under true
  * Structured Streaming: watermarked tumbling windows emit exactly once, in
  * append mode, when the watermark passes the window end.
  */
class StreamingWindowSpec extends SparkSuite {

  test("watermarked tumbling window emits closed windows exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    def t(min: Int) = new Timestamp(3600000L + min * 60000L)
    try {
      // two events in [60,65), one in [65,70)
      input.addData((t(1), "view", 1.0), (t(3), "view", 2.0), (t(6), "click", 4.0))
      q.processAllAvailable()
      // nothing closed yet (watermark = max event time, [60,65) not < wm end?
      // wm after batch = t(6); [60,65) end t(65)min... end=65>6? window ends
      // at minute 65 of the hour — only windows with end <= watermark emit
      input.addData((t(11), "view", 8.0))
      q.processAllAvailable()
      val after2 = spark.table("win_out").collect()
      // watermark reached t(11) ⇒ the [*:00,*:05) window (end minute 5 + 60)
      // is closed; [65,70) closes too once wm t(11) ≥ end t(10)
      assert(after2.exists(r => r.getAs[Long]("n") == 2 &&
        r.getAs[String]("event_type") == "view"), after2.mkString(","))
      input.addData((t(20), "view", 16.0))
      q.processAllAvailable()
      val all = spark.table("win_out").collect()
      // the click window [65,70) emitted exactly once with its single event
      val clicks = all.filter(_.getAs[String]("event_type") == "click")
      assert(clicks.length == 1 && clicks(0).getAs[Long]("n") == 1 &&
        clicks(0).getAs[Double]("sum_value") == 4.0, all.mkString(","))
      // no window is ever emitted twice
      val keys = all.map(r => (r.getAs[Timestamp]("w_start"), r.getString(1)))
      assert(keys.distinct.length == keys.length)
    } finally q.stop()
  }
}
