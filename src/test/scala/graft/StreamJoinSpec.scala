package graft

import java.sql.Timestamp

import graft.streaming.StatefulSessions.Ev
import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join: in-window pairs emitted, out-of-window and
  * cross-key pairs never, late data beyond both watermarks dropped.
  */
class StreamJoinSpec extends SparkSuite {

  private def t(min: Int) = new Timestamp(3600000L + min * 60000L)

  test("interval join matches within the horizon, never across keys or beyond it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = StreamJoin.interval(
      impressions.toDF().withWatermark("ts", "30 minutes"),
      clicks.toDF().withWatermark("ts", "30 minutes"),
      key = "user_id", horizon = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      impressions.addData(Ev(1, t(0), "imp", 0), Ev(2, t(0), "imp", 0))
      clicks.addData(
        Ev(1, t(5), "click", 0),   // in window for user 1
        Ev(2, t(20), "click", 0),  // beyond the 10-minute horizon
        Ev(3, t(5), "click", 0))   // no matching impression key
      q.processAllAvailable()
      val rows = spark.table("sj_out")
        .select("user_id", "l_ts", "r_ts").collect()
      assert(rows.length == 1, rows.mkString(","))
      assert(rows.head.getLong(0) == 1L)
      assert(rows.head.getTimestamp(1) == t(0) && rows.head.getTimestamp(2) == t(5))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows only after the watermark closes the window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = StreamJoin.interval(
      impressions.toDF().withWatermark("ts", "5 minutes"),
      clicks.toDF().withWatermark("ts", "5 minutes"),
      key = "user_id", horizon = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      impressions.addData(Ev(1, t(0), "imp", 0), Ev(9, t(0), "imp", 0))
      clicks.addData(Ev(1, t(5), "click", 0))
      q.processAllAvailable()
      // user 9's no-match row cannot exist yet — a click could still arrive
      val early = spark.table("sj_outer").filter($"user_id" === 9).count()
      assert(early == 0, s"unmatched row emitted before watermark: $early")
      // advance both watermarks far past t(0)+horizon...
      impressions.addData(Ev(8, t(60), "imp", 0))
      clicks.addData(Ev(8, t(61), "click", 0))
      q.processAllAvailable()
      impressions.addData(Ev(7, t(70), "imp", 0))
      clicks.addData(Ev(7, t(71), "click", 0))
      q.processAllAvailable()
      // ...now the unmatched impression must have been flushed with nulls
      val nine = spark.table("sj_outer").filter($"user_id" === 9).collect()
      assert(nine.length == 1, spark.table("sj_outer").collect().mkString(","))
      assert(nine.head.isNullAt(nine.head.fieldIndex("r_ts")))
    } finally q.stop()
  }

  test("stream-static enrich joins each micro-batch against the dim, no state store") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "tier")
    val q = StreamJoin.enrich(events.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("sj_enrich")
      .outputMode("append").start()
    try {
      // no watermark anywhere: stream-static needs none (that would throw
      // on a stateful stream-stream join in append mode)
      events.addData(Ev(1, t(0), "view", 0), Ev(3, t(1), "view", 0))
      q.processAllAvailable()
      val rows = spark.table("sj_enrich")
        .select("user_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 3L -> None), rows.toString)
      // dim keys with no stream row never appear (left_outer from the stream)
      assert(!spark.table("sj_enrich").collect().exists(_.getLong(0) == 2L))
    } finally q.stop()
  }

  test("interval join state is bounded: watermark predicate is accepted for append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val a = MemoryStream[Ev]
    val b = MemoryStream[Ev]
    // append-mode start() itself verifies Spark derived state-cleanup bounds
    // from the watermark + interval condition; an unbounded join would throw
    val q = StreamJoin.interval(
      a.toDF().withWatermark("ts", "5 minutes"),
      b.toDF().withWatermark("ts", "5 minutes"),
      key = "user_id", horizon = "1 minutes")
      .writeStream.format("memory").queryName("sj_bounded")
      .outputMode("append").start()
    try {
      a.addData(Ev(1, t(0), "imp", 0))
      b.addData(Ev(1, t(1), "click", 0))
      q.processAllAvailable()
      assert(spark.table("sj_bounded").count() == 1)
    } finally q.stop()
  }
}
