package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest prior-or-equal right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")) // key 2 has no prior right row
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00")),
      (1L, ts("2024-01-01 10:00:00")), // exactly equal → counts as prior-or-equal
      (1L, ts("2024-01-01 11:59:59")),
      (2L, ts("2024-01-01 09:00:01"))) // later than left's only row
      .toDF("user_id", "ts")

    val got = AsOfJoin(left, right, "user_id", "ts", "ts")
      .select("tag", "asof_ts").collect()
      .map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap

    assert(got("p1").contains(ts("2024-01-01 10:00:00"))) // equal-ts match
    assert(got("p2").contains(ts("2024-01-01 11:59:59")))
    assert(got("p3").isEmpty)                              // no prior → null
  }

  test("as-of join output row count equals left side") {
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    val views = ev.filter(col("event_type") === "view").select("user_id", "ts")
    val joined = AsOfJoin(purchases, views, "user_id", "ts", "ts")
    assert(joined.count() == purchases.count())
  }

  test("nearest as-of: closer side wins, equidistant ties resolve backward") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "closer_after"),  // gaps 2h back / 1h fwd
      (2L, ts("2024-01-01 10:00:00"), "tie"),           // 2h both ways → back
      (3L, ts("2024-01-01 10:00:00"), "only_after"),
      (4L, ts("2024-01-01 10:00:00"), "only_before"),
      (5L, ts("2024-01-01 10:00:00"), "no_right"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-01 15:00:00")),
      (4L, ts("2024-01-01 01:00:00")))
      .toDF("user_id", "ts")
    val got = AsOfJoin.nearest(left, right, "user_id", "ts", "ts")
      .select("tag", "nearest_ts").collect()
      .map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(got("closer_after").contains(ts("2024-01-01 11:00:00")))
    assert(got("tie").contains(ts("2024-01-01 08:00:00"))) // backward on ties
    assert(got("only_after").contains(ts("2024-01-01 15:00:00")))
    assert(got("only_before").contains(ts("2024-01-01 01:00:00")))
    assert(got("no_right").isEmpty)
    // one output row per left row — the union never duplicates or drops
    assert(AsOfJoin.nearest(left, right, "user_id", "ts", "ts").count() ==
      left.count())
  }
}
