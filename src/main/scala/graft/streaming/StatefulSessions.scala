package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY.md §2.10
  * T5 / the builder contract's "custom state" requirement): per-user sessions
  * with a gap timeout, carrying arbitrary per-session state that the
  * declarative `session_window` aggregate cannot express (here: first/last
  * event type and a running value sum emitted only when the session closes).
  *
  * Scale shape: state lives in the state store, partitioned by user_id — the
  * same hash shuffle a groupBy would do; no driver-side state. Event-time
  * timeout + watermark bound state size; sessions for dead keys are evicted
  * when the watermark passes their gap deadline.
  */
object StatefulSessions {

  /** One input event (a projection of the `events` table). */
  final case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** Accumulating per-session state. */
  final case class SessionState(
      start: Long, last: Long, n: Int, sum: Double,
      firstType: String, lastType: String)

  /** One closed session. */
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, sum_value: Double, first_type: String, last_type: String)

  val GapMs: Long = 10 * 60 * 1000L
  private val GapUs: Long = GapMs * 1000L

  /** Timestamps carry microseconds (parquet/`session_window` precision);
    * `Timestamp.getTime` is millis-only, so state math runs in micros.
    */
  private def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Sessionize a (possibly streaming) event Dataset.
    *
    * Streaming (`closeFinal = false`): pair with `withWatermark("ts", …)`
    * upstream; the event-time timeout closes a user's open session once the
    * watermark passes its gap deadline.
    *
    * Batch (`closeFinal = true`): Spark runs the function once per key over
    * all rows and never fires timeouts, so the trailing open session must be
    * flushed inline — otherwise it would be silently dropped.
    */
  def sessionize(events: Dataset[Ev], closeFinal: Boolean): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processUser(closeFinal))
  }

  /** Fold a user's new events into session state, emitting every session
    * that closed (gap exceeded) plus, on timeout / final flush, the open one.
    */
  def processUser(closeFinal: Boolean)(userId: Long, rows: Iterator[Ev],
                  state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
    if (sorted.isEmpty) {
      // no new data: we were invoked by an event-time timeout — close out
      val out = state.getOption.map(emit(userId, _)).iterator
      state.remove()
      return out
    }
    var closed = List.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      cur match {
        case Some(s) if t - s.last < GapUs =>
          cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
            sum = s.sum + e.value, lastType = e.event_type))
        case Some(s) =>
          closed ::= emit(userId, s)
          cur = Some(SessionState(t, t, 1, e.value, e.event_type, e.event_type))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value, e.event_type, e.event_type))
      }
    }
    cur.foreach { s =>
      if (closeFinal) {
        closed ::= emit(userId, s)
        state.remove()
      } else {
        state.update(s)
        state.setTimeoutTimestamp(Math.floorDiv(s.last, 1000L) + GapMs)
      }
    }
    closed.reverseIterator
  }

  private def emit(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, fromMicros(s.start), fromMicros(s.last + GapUs),
      s.n, s.sum, s.firstType, s.lastType)

  /** Batch-mode convenience over the events table projection. */
  def sessionizeBatch(spark: SparkSession, df: org.apache.spark.sql.DataFrame): Dataset[ClosedSession] = {
    import spark.implicits._
    val evs = df.selectExpr("user_id", "ts", "event_type", "value").as[Ev]
    sessionize(evs, closeFinal = true)
  }
}
