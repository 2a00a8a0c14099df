package graft.streaming

import graft.{Q, Tables}
import graft.functions.Deterministic._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY.md §2.10 T5):
  * tumbling, sliding and session windows. Declared here in batch mode (the
  * same `window()`/`session_window()` expressions run unchanged under
  * Structured Streaming with a watermark — StreamingSpec covers that); batch
  * mode is what the DuckDB oracle can check.
  */
object EventWindows {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Tumbling 1-hour windows per event type. Epoch-aligned, so the oracle is
    * a plain date_trunc.
    */
  private val windowTumbling = Q(
    "events_window_tumbling",
    (s, dir) => ev(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type"),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
           | count(*) AS n,
           | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Sliding 1-hour windows every 30 minutes: each event lands in exactly
    * two windows. The oracle expands the two containing window starts
    * explicitly.
    */
  private val windowSliding = Q(
    "events_window_sliding",
    (s, dir) => ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type"),
    Some("""WITH x AS (SELECT event_type,
           |   date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
           |     THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS slot
           | FROM events),
           |y AS (SELECT event_type,
           |   unnest([slot, slot - INTERVAL 30 MINUTE]) AS window_start FROM x)
           |SELECT window_start, event_type, count(*) AS n
           |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Session windows per user with a 10-minute gap: events closer than the
    * gap merge into one session; the session closes gap after the last
    * event. The oracle is the classic gaps-and-islands rewrite (lag +
    * running break count) — same strict-< merge semantics as Spark's
    * `session_window`.
    */
  private val windowSession = Q(
    "events_window_session",
    (s, dir) => ev(s, dir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start"),
    Some("""WITH e AS (SELECT user_id, ts, value FROM events),
           |x AS (SELECT user_id, ts, value,
           |   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
           |          < INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS brk
           | FROM e),
           |y AS (SELECT user_id, ts, value, SUM(brk) OVER (
           |   PARTITION BY user_id ORDER BY ts
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           | FROM x)
           |SELECT min(ts) AS session_start,
           | max(ts) + INTERVAL 10 MINUTE AS session_end,
           | user_id, count(*) AS n_events,
           | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM y GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin))

  /** Event-time interval join in batch — the oracle-checkable twin of
    * [[StreamJoin.interval]]: every (view → purchase) pair for the same user
    * with the purchase inside the 30-minute attribution window after the
    * view. Equi-join on the user with the time bound as a residual
    * predicate — one key shuffle, no row explosion beyond true matches; the
    * identical predicate under watermarks is the streaming variant.
    */
  private val eventsAttribution = Q(
    "events_attribution",
    (s, dir) => {
      val e = ev(s, dir)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      v.join(p, col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("view_id"), col("purchase_id"))
        .orderBy("user_id", "view_id", "purchase_id")
    },
    Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
           |FROM events v JOIN events p
           |  ON v.user_id = p.user_id
           | AND v.event_type = 'view' AND p.event_type = 'purchase'
           | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
           |ORDER BY v.user_id, view_id, purchase_id""".stripMargin))

  val queries: Seq[Q] = Seq(windowTumbling, windowSliding, windowSession,
    eventsAttribution)
}
