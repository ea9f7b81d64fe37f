package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch operators: the same event
  * semantics (windowed aggregation, gap sessionization) expressed over an
  * unbounded source with watermarks and state.
  *
  * Design: identical column contracts to the batch versions so a pipeline
  * can swap `spark.read` for `spark.readStream` without changing consumers.
  * Watermarks bound state: at 100 TB/day the window state is
  * (windows × event_types), the session state is live-users only — both
  * independent of total history.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type, late data bounded by the
    * watermark. Append-mode compatible (emit on window close). */
  def windowedEventAgg(events: DataFrame, watermarkDelay: String = "10 minutes",
                       windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Watermarked stream-stream interval join: each left event pairs with
    * right events sharing `key` whose `ts` falls in
    * [left.ts, left.ts + within]. Both sides carry watermarks and the join
    * condition bounds event time in BOTH directions, so Spark can prove
    * state eviction — the requirement that makes an unbounded join runnable
    * at 100 TB (state = in-flight interval per key, not history).
    *
    * Right-side columns come back prefixed `r_` (including its event-time
    * column); the right key column is dropped after the equi-match. Works
    * unchanged on batch frames (watermarks skipped) so the gate can
    * oracle-check the exact join semantics the stream runs — same column
    * contract both ways.
    *
    * @param tsCol each side's event-time column (left uses it as-is; the
    *   right side's is read as `r_tsCol` after prefixing). Validated up
    *   front: watermarking or joining on a wrong-but-present column would
    *   silently bound state on unrelated times.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   within: String, watermarkDelay: String = "10 minutes",
                   tsCol: String = "ts"): DataFrame = {
    require(left.columns.contains(tsCol),
      s"intervalJoin: left side has no event-time column '$tsCol' " +
        s"(columns: ${left.columns.mkString(", ")})")
    require(right.columns.contains(tsCol),
      s"intervalJoin: right side has no event-time column '$tsCol' " +
        s"(columns: ${right.columns.mkString(", ")})")
    def wm(df: DataFrame, c: String) =
      if (df.isStreaming) df.withWatermark(c, watermarkDelay) else df
    val r = wm(right.toDF(right.columns.map(c => s"r_$c"): _*), s"r_$tsCol")
    wm(left, tsCol)
      .join(r,
        col(key) === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(tsCol) &&
        col(s"r_$tsCol") <= col(tsCol) + expr(s"INTERVAL $within"))
      .drop(s"r_$key")
  }

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Timestamp, end: Timestamp, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                     n_events: Long, total_value: Double)

  /** Microsecond view of a Timestamp — java.sql.Timestamp.getTime is only
    * ms-precise; state keeps the original Timestamps so emitted sessions are
    * µs-identical to the batch operator (asserted on the full events table
    * in StreamingSpec). */
  private def us(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Stateful gap sessionization via flatMapGroupsWithState: a session
    * closes (and is emitted) when no event arrives within `gapMinutes` of
    * its last event — tracked with an event-time timeout so state for idle
    * users is reclaimed by the watermark.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60000000L
    val gapMs = gapMinutes.toLong * 60000L

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.end, s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (us(e.ts), e.value))
            var cur = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              cur match {
                case null =>
                  cur = SessionState(e.ts, e.ts, 1, e.value)
                case s if us(e.ts) - us(s.end) > gapUs =>
                  closed += Session(userId, s.start, s.end, s.n, s.total)
                  cur = SessionState(e.ts, e.ts, 1, e.value)
                case s =>
                  val end = if (us(e.ts) > us(s.end)) e.ts else s.end
                  cur = SessionState(s.start, end, s.n + 1, s.total + e.value)
              }
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.end.getTime + gapMs)
            closed.result().iterator
          }
      }
  }
}
