package graft.pipeline

import java.time.{Duration, LocalDate, LocalDateTime}
import java.time.temporal.ChronoUnit

import scala.collection.mutable

/** Schedule semantics the reference gets from Airflow's scheduler
  * (`dags/ingest_raw_sales.py:44-52`): a cron `schedule_interval`,
  * `start_date`, `catchup`, `max_active_runs`, modeled as an explicit
  * clock-driven state machine — `tick(now)` is the scheduler heartbeat, so
  * tests (and embedding jobs) drive simulated time instead of sleeping.
  *
  * Airflow's interval model is kept: the run for logical date T executes
  * once its schedule interval has CLOSED, i.e. at the next cron fire after
  * T; `{{ ds }}` = T's date. `catchup=false` skips the pre-existing backlog
  * except the most recent closed interval (exactly Airflow's behavior on
  * unpause); after the first run, every newly closed interval runs.
  * `max_active_runs` caps how many backlog runs one tick may dispatch —
  * execution inside a tick is serial, so 1 (the reference's setting) means
  * one logical date per heartbeat even mid-catchup.
  */
object Scheduler {

  /** Standard 5-field cron: each field is `*`, a value, an `a-b` range, a
    * stepped range (`a-b/n`, or step-over-all written asterisk-slash-n),
    * or a comma list of those (`None` = `*`, `Some(set)` = the allowed
    * values). dow: 0 = Sunday. */
  final case class Cron(minute: Option[Set[Int]], hour: Option[Set[Int]],
                        dom: Option[Set[Int]], month: Option[Set[Int]],
                        dow: Option[Set[Int]]) {

    /** Standard-cron day rule: when BOTH day-of-month and day-of-week are
      * restricted they combine with OR, not AND (`13 * 5` = the 13th OR
      * any Friday). */
    private def dayMatches(t: LocalDateTime): Boolean = (dom, dow) match {
      case (Some(d), Some(w)) =>
        d.contains(t.getDayOfMonth) || w.contains(t.getDayOfWeek.getValue % 7)
      case _ =>
        dom.forall(_.contains(t.getDayOfMonth)) &&
        dow.forall(_.contains(t.getDayOfWeek.getValue % 7))
    }

    def matches(t: LocalDateTime): Boolean =
      minute.forall(_.contains(t.getMinute)) && hour.forall(_.contains(t.getHour)) &&
      month.forall(_.contains(t.getMonthValue)) && dayMatches(t)

    /** First fire time STRICTLY after `after`. Jumps whole days/hours when
      * the date/hour fields rule them out, so even a Feb-29 cron resolves
      * in a few thousand steps. */
    def next(after: LocalDateTime): LocalDateTime = {
      var t = after.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      var guard = 0
      while (!matches(t)) {
        guard += 1
        require(guard < 20000, s"cron $this: no fire time within bound after $after")
        if (month.exists(!_.contains(t.getMonthValue)) || !dayMatches(t))
          t = t.toLocalDate.plusDays(1).atStartOfDay
        else if (hour.exists(!_.contains(t.getHour)))
          t = t.plusHours(1).withMinute(0)
        else
          t = t.plusMinutes(1)
      }
      t
    }
  }

  object Cron {
    def parse(expr: String): Cron = {
      val f = expr.trim.split("\\s+")
      require(f.length == 5, s"cron '$expr': expected 5 fields, got ${f.length}")
      def bad(part: String): Nothing =
        throw new IllegalArgumentException(s"cron '$expr': bad field '$part'")
      def p(s: String, lo: Int, hi: Int, what: String): Option[Set[Int]] =
        if (s == "*") None
        else Some(s.split(',').iterator.flatMap { part =>
          // malformed syntax surfaces as IllegalArgumentException with the
          // expression in the message, never MatchError/NumberFormatException
          try {
            val (rangePart, step) = part.split('/') match {
              case Array(r) => (r, 1)
              case Array(r, st) => (r, st.toInt)
              case _ => bad(part)
            }
            require(step >= 1, s"cron '$expr': step must be >= 1 in '$part'")
            val (a, b) = rangePart match {
              case "*" => (lo, hi)
              case r if r.contains('-') => r.split('-') match {
                case Array(x, y) => (x.toInt, y.toInt)
                case _ => bad(part)
              }
              // bare value with a step ("5/15") starts there and runs to max
              case x => val v = x.toInt; if (step == 1) (v, v) else (v, hi)
            }
            require(a >= lo && b <= hi && a <= b,
              s"cron '$expr': $what range $a-$b out of [$lo,$hi]")
            a to b by step
          } catch { case _: NumberFormatException => bad(part) }
        }.toSet)
      // vixie cron: dow accepts 7 as Sunday — normalize to 0
      Cron(p(f(0), 0, 59, "minute"), p(f(1), 0, 23, "hour"), p(f(2), 1, 31, "dom"),
           p(f(3), 1, 12, "month"), p(f(4), 0, 7, "dow").map(_.map(_ % 7)))
    }
  }

  final case class ScheduleSpec(
      schedule: Cron,
      startDate: LocalDate,
      catchup: Boolean = false,
      maxActiveRuns: Int = 1,
      retries: Int = 0,
      retryDelay: Duration = Duration.ZERO) {
    require(maxActiveRuns >= 1, "maxActiveRuns must be >= 1")
  }

  object ScheduleSpec {
    def daily(startDate: String, catchup: Boolean = false): ScheduleSpec =
      ScheduleSpec(Cron.parse("0 0 * * *"), LocalDate.parse(startDate), catchup)
  }

  final case class RunResult(executionDate: LocalDateTime, ds: String, report: Dag.Report)

  /** Cross-schedule coupling — the reference's ExternalTaskSensor
    * (`dags/process_core_sales.py:58-66`: core@02:00 waits on raw@00:00's
    * `end` task, reschedule mode, 1 h timeout). The downstream run for
    * execution date E is held in the backlog until `upstream` has a
    * SUCCESSFUL run for execution date `E - executionDelta` (Airflow's
    * `execution_delta`; 2 h couples a `0 2 * * *` run to the same day's
    * `0 0 * * *` run). Reschedule-mode polling becomes "stays queued,
    * later dates still dispatch" (`depends_on_past=False`), and `timeout`
    * becomes a recorded failed run whose real tasks never fired. Recovery
    * is Airflow's too: [[Scheduled.clear]] the failed upstream day, let
    * both schedulers tick, and the held downstream run fires. */
  final case class ExternalSensor(name: String, upstream: Scheduled,
                                  executionDelta: Duration = Duration.ZERO,
                                  timeout: Duration = Duration.ofHours(1)) {
    def satisfied(execDate: LocalDateTime): Boolean = {
      val target = execDate.minus(executionDelta)
      upstream.runs.exists(r => r.executionDate == target && r.report.succeeded)
    }
  }

  /** One scheduled DAG. `mkTasks(ds)` builds the run's tasks (reference
    * `{{ ds }}` templating); the spec's `retries`/`retryDelay` are applied
    * as defaults to tasks that declare none (Airflow `default_args`). */
  final class Scheduled(spec: ScheduleSpec, mkTasks: String => Seq[Dag.Task],
                        callbacks: Dag.Callbacks = Dag.Callbacks(),
                        sleep: Long => Unit = Thread.sleep,
                        sensors: Seq[ExternalSensor] = Nil) {

    private var lastScheduled: Option[LocalDateTime] = None
    private val backlog = mutable.ArrayBuffer.empty[LocalDateTime]
    private val results = mutable.ArrayBuffer.empty[RunResult]
    // first tick that found the run sensor-blocked — timeout anchor
    private val pokedAt = mutable.Map.empty[LocalDateTime, LocalDateTime]

    def runs: Seq[RunResult] = results.toSeq

    /** Advance the scheduler clock to `now`: enqueue every newly closed
      * interval, then execute up to `maxActiveRuns` queued runs in order.
      * A sensor-blocked run stays queued without consuming a slot (later
      * dates dispatch past it); a run blocked past its sensor timeout is
      * recorded failed without its tasks firing. Returns the runs executed
      * or timed out by THIS tick. */
    def tick(now: LocalDateTime): Seq[RunResult] = {
      enqueueDue(now)
      val batch = mutable.ArrayBuffer.empty[RunResult]
      var i = 0
      while (i < backlog.size && batch.size < spec.maxActiveRuns) {
        val execDate = backlog(i)
        val blocking = sensors.filterNot(_.satisfied(execDate))
        if (blocking.isEmpty) {
          backlog.remove(i)
          pokedAt.remove(execDate)
          batch += execute(execDate)
        } else {
          val since = pokedAt.getOrElseUpdate(execDate, now)
          val timedOut = blocking.filter(s => !now.isBefore(since.plus(s.timeout)))
          if (timedOut.nonEmpty) {
            backlog.remove(i)
            pokedAt.remove(execDate)
            batch += senseTimeout(execDate, timedOut, since)
          } else i += 1 // reschedule mode: hold this date, try the next
        }
      }
      batch.toSeq
    }

    private def execute(execDate: LocalDateTime): RunResult = {
      val ds = execDate.toLocalDate.toString
      val tasks = mkTasks(ds).map { t =>
        if (t.retries == 0 && t.retryDelay.isZero && spec.retries > 0)
          Dag.Task(t.id, t.deps, spec.retries, spec.retryDelay)(t.run)
        else t
      }
      val result = RunResult(execDate, ds, Dag.run(tasks, callbacks, sleep))
      results += result
      result
    }

    /** Sensor timeout = the run fails with the sensor task Failed and every
      * real task Skipped (Airflow: the sensor task times out, downstream of
      * it never schedules). */
    private def senseTimeout(execDate: LocalDateTime,
                             timedOut: Seq[ExternalSensor],
                             since: LocalDateTime): RunResult = {
      val ds = execDate.toLocalDate.toString
      val statuses = mutable.Map.empty[String, Dag.Status]
      val order = mutable.ArrayBuffer.empty[String]
      timedOut.foreach { s =>
        val err = new IllegalStateException(
          s"sensor ${s.name}: no successful upstream run for " +
            s"${execDate.minus(s.executionDelta)} within ${s.timeout} (first poked $since)")
        statuses(s.name) = Dag.Failed(1, err)
        order += s.name
        callbacks.onFailure(s.name, err)
      }
      mkTasks(ds).foreach { t => statuses(t.id) = Dag.Skipped; order += t.id }
      val result = RunResult(execDate, ds, Dag.Report(statuses.toMap, order.toSeq))
      results += result
      result
    }

    /** Airflow "clear": forget a recorded (typically failed) run and
      * re-queue its execution date, so the next tick re-executes it — the
      * standard recovery that un-blocks downstream sensors waiting on it. */
    def clear(execDate: LocalDateTime): Unit = {
      val idx = results.indexWhere(_.executionDate == execDate)
      require(idx >= 0, s"clear: no run recorded for $execDate")
      results.remove(idx)
      pokedAt.remove(execDate)
      backlog += execDate
      backlog.sortInPlace()(Ordering.fromLessThan[LocalDateTime](_ isBefore _))
    }

    /** Drain: tick until no backlog remains at `now` (multi-heartbeat
      * catchup in one call — test convenience). */
    def drain(now: LocalDateTime): Seq[RunResult] = {
      val out = mutable.ArrayBuffer.empty[RunResult]
      var batch = tick(now)
      while (batch.nonEmpty) { out ++= batch; batch = tick(now) }
      out.toSeq
    }

    private def enqueueDue(now: LocalDateTime): Unit = {
      val start = spec.startDate.atStartOfDay
      var exec = lastScheduled match {
        case Some(l) => spec.schedule.next(l)
        case None => if (spec.schedule.matches(start)) start else spec.schedule.next(start)
      }
      val due = mutable.ArrayBuffer.empty[LocalDateTime]
      // the run for execution date `exec` is due once its interval closes
      while (!spec.schedule.next(exec).isAfter(now)) {
        due += exec
        exec = spec.schedule.next(exec)
      }
      if (due.nonEmpty) {
        val kept = if (spec.catchup || lastScheduled.nonEmpty) due.toSeq else Seq(due.last)
        backlog ++= kept
        lastScheduled = Some(due.last)
      }
    }
  }
}
