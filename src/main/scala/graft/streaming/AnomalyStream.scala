package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous trailing z-score anomaly flags — the streaming twin of
  * [[graft.operators.RollingFeatures.anomalies]], with EXACTLY the batch
  * semantics: each event scores against the trailing `[sec−H, sec]`
  * window of its key (self-inclusive, same-second peers included),
  * moments from exact integer cent sums, flag when `n ≥ minN` and
  * `|x − mean| > z·sd`.
  *
  * Exactness under disorder is watermark-delayed emission (the
  * [[Scd2Stream]] discipline): events buffer in per-key state and a
  * verdict is emitted only once the watermark passes the event's
  * second — at that point every member of its trailing window has
  * arrived (later-watermark events are dropped by the stream), so the
  * emitted flag equals the batch operator's on the same data, replay
  * convergent, regardless of arrival order or batch boundaries.
  *
  * State per key = events inside `horizon + watermark-slack` — bounded
  * by event rate × horizon, independent of history (the 100 TB
  * requirement). Keys with pending-but-quiet buffers flush via
  * event-time timeouts, not future traffic. */
object AnomalyStream {

  case class Flag(user_id: Long, ts: Timestamp, value: Double,
                  n: Long, mean: Double, sd: Double)

  /** One buffered observation: epoch second, exact cents, original
    * value + timestamp (emitted verbatim). */
  case class Obs(sec: Long, cents: Long, value: Double, ts: Timestamp)
  case class AnomState(buf: List[Obs], emittedThrough: Long)

  /** @param horizonSeconds trailing window length H
    * @param watermarkDelay lateness bound (events later than this drop)
    * @param z flag threshold in trailing standard deviations
    * @param minN windows thinner than this never flag */
  def anomalies(events: Dataset[StreamOps.Event], horizonSeconds: Long,
                watermarkDelay: String = "10 minutes",
                z: Double = 3.0, minN: Long = 5L): Dataset[Flag] = {
    import events.sparkSession.implicits._
    val h = horizonSeconds

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomState, Flag](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[AnomState]) =>
          val prev = state.getOption.getOrElse(AnomState(Nil, Long.MinValue))
          val fresh = it.map { e =>
            val sec = Math.floorDiv(e.ts.getTime, 1000L)
            // mirror Spark's round(): BigDecimal HALF_UP on the decimal
            // rendering (math.round floors x+0.5 — differs on negatives)
            val cents = java.math.BigDecimal.valueOf(e.value * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
            Obs(sec, cents, e.value, e.ts)
          }.toList
          val wmSec =
            if (state.getCurrentWatermarkMs() == 0L) Long.MinValue
            else Math.floorDiv(state.getCurrentWatermarkMs(), 1000L)

          // event-time order; ties broken deterministically so replay
          // emits identical rows (same-second peers share moments anyway)
          val buf = (prev.buf ++ fresh).sortBy(o => (o.sec, o.cents, o.value))
          // ripe = the watermark has passed the END of the event's second
          // (wm ≥ (sec+1)·1000 ⟺ sec < wmSec): a same-second peer with
          // ts ≥ wm is NOT late (Spark drops only ts < wm) and may still
          // arrive — emitting at sec == wmSec would both score without it
          // and then suppress its own verdict forever
          val (ripe, pending) = buf.partition(_.sec < wmSec)
          val out = ripe.filter(_.sec > prev.emittedThrough).flatMap { e =>
            val w = buf.filter(o => o.sec >= e.sec - h && o.sec <= e.sec)
            val n = w.size.toLong
            val s1 = w.map(_.cents).sum
            // exact moments or a loud error — a silent Σc² long wrap
            // would emit WRONG flags (the batch twin raises too)
            val s2 = w.foldLeft(0L)((acc, o) =>
              Math.addExact(acc, Math.multiplyExact(o.cents, o.cents)))
            val m = s1.toDouble / n
            val sd = math.sqrt(math.max(s2.toDouble / n - m * m, 0.0)) / 100.0
            val mean = m / 100.0
            if (n >= minN && math.abs(e.value - mean) > z * sd)
              Some(Flag(userId, e.ts, e.value, n, mean, sd))
            else None
          }

          // keep ripe events still inside a pending event's possible
          // window; everything below wm − H can never be read again
          // (guard the no-watermark-yet sentinel: MinValue − h wraps)
          val evictBelow =
            if (wmSec == Long.MinValue) Long.MinValue else wmSec - h
          val kept = buf.filter(_.sec >= evictBelow)
          // emitted-through tracks the last COMPLETE second (wmSec − 1,
          // matching the strict ripeness split; sentinel guarded — the
          // MinValue − 1 wrap would mark everything emitted)
          val emittedThrough =
            if (wmSec == Long.MinValue) prev.emittedThrough
            else math.max(prev.emittedThrough, wmSec - 1)
          if (kept.isEmpty) state.remove()
          else {
            state.update(AnomState(kept, emittedThrough))
            // pending verdicts: wake when the watermark ripens the next
            // one. Fully-emitted buffers still arm a timeout at their own
            // expiry — a key that never speaks again must not hold its
            // window forever (dead keys would otherwise accumulate state)
            val wake = pending.headOption.map(_.sec + 1)
              .getOrElse(kept.map(_.sec).max + h + 1)
            state.setTimeoutTimestamp(wake * 1000L)
          }
          out.iterator
      }
  }
}
