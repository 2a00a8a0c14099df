package graft

import java.sql.Timestamp

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Custom-state sessionization: batch equivalence against the declarative
  * `session_window` aggregate, and true streaming behavior (gap close +
  * watermark-timeout close) over a MemoryStream.
  */
class StatefulSessionsSpec extends SparkSuite {

  test("batch sessionization matches the declarative session_window aggregate") {
    val ev = Tables.load(spark, sfDir, "events")
    val got = StatefulSessions.sessionizeBatch(spark, ev)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
      .toSet
    val want = Queries.byName("events_window_session").run(spark, sfDir)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3).toInt))
      .toSet
    assert(got.nonEmpty && got == want,
      s"missing=${want.diff(got).take(3)} extra=${got.diff(want).take(3)}")
  }

  test("streaming: sessions close on gap and on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StatefulSessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Ev], closeFinal = false)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def t(min: Int) = new Timestamp(3600000L + min * 60000L)
    try {
      input.addData(Ev(1, t(0), "view", 1.0), Ev(1, t(5), "click", 2.0))
      q.processAllAvailable()
      // 25 min gap > 10 min: closes user 1's first session
      input.addData(Ev(1, t(30), "purchase", 3.0))
      q.processAllAvailable()
      val afterGap = spark.table("sess_out").as[ClosedSession].collect()
      assert(afterGap.length == 1, afterGap.mkString(","))
      assert(afterGap(0).n_events == 2 && afterGap(0).first_type == "view" &&
        afterGap(0).last_type == "click" && afterGap(0).sum_value == 3.0)
      assert(afterGap(0).session_end.getTime - afterGap(0).session_start.getTime
        == 5 * 60000L + StatefulSessions.GapMs)
      // advance the watermark far past user 1's t(30)+10min deadline; the
      // timeout fires on the batch AFTER the watermark update is committed
      input.addData(Ev(2, t(60), "view", 1.0))
      q.processAllAvailable()
      input.addData(Ev(2, t(61), "view", 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[ClosedSession].collect()
      assert(all.exists(c => c.user_id == 1 && c.n_events == 1 &&
        c.first_type == "purchase"), all.mkString(","))
    } finally q.stop()
  }
}
