package graft.pipeline

import java.time.{Duration, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

class SchedulerSpec extends AnyFunSuite {
  import Scheduler._

  test("Cron: parse, match, next for the reference's '0 0 * * *'") {
    val c = Cron.parse("0 0 * * *")
    assert(c.next(LocalDateTime.parse("2024-03-01T10:30")) ==
      LocalDateTime.parse("2024-03-02T00:00"))
    assert(c.next(LocalDateTime.parse("2024-03-02T00:00")) ==
      LocalDateTime.parse("2024-03-03T00:00")) // strictly after
    intercept[IllegalArgumentException](Cron.parse("0 0 * *"))
    intercept[IllegalArgumentException](Cron.parse("61 0 * * *"))
  }

  test("Cron: weekly and monthly fields jump correctly") {
    val monday630 = Cron.parse("30 6 * * 1")
    // 2024-03-01 is a Friday; next Monday is 2024-03-04
    assert(monday630.next(LocalDateTime.parse("2024-03-01T00:00")) ==
      LocalDateTime.parse("2024-03-04T06:30"))
    val feb29 = Cron.parse("0 12 29 2 *")
    assert(feb29.next(LocalDateTime.parse("2024-03-01T00:00")) ==
      LocalDateTime.parse("2028-02-29T12:00"))
  }

  test("Cron: lists, ranges, and steps") {
    val q = Cron.parse("*/15 * * * *")
    assert(q.next(LocalDateTime.parse("2024-03-01T10:07")) ==
      LocalDateTime.parse("2024-03-01T10:15"))
    assert(q.next(LocalDateTime.parse("2024-03-01T10:45")) ==
      LocalDateTime.parse("2024-03-01T11:00"))
    val weekdays = Cron.parse("30 6 * * 1-5")
    // 2024-03-01 is a Friday; from Friday 07:00 the next weekday 06:30 is Monday
    assert(weekdays.next(LocalDateTime.parse("2024-03-01T07:00")) ==
      LocalDateTime.parse("2024-03-04T06:30"))
    val paydays = Cron.parse("0 0 1,15 * *")
    assert(paydays.next(LocalDateTime.parse("2024-03-02T00:00")) ==
      LocalDateTime.parse("2024-03-15T00:00"))
    val everyOtherHour = Cron.parse("0 8-16/4 * * *")
    assert(everyOtherHour.next(LocalDateTime.parse("2024-03-01T09:00")) ==
      LocalDateTime.parse("2024-03-01T12:00"))
    intercept[IllegalArgumentException](Cron.parse("0 25-30 * * *"))
    intercept[IllegalArgumentException](Cron.parse("0/0 * * * *"))
    // malformed syntax is IllegalArgumentException, never MatchError/NFE
    intercept[IllegalArgumentException](Cron.parse("0 1-2-3 * * *"))
    intercept[IllegalArgumentException](Cron.parse("0 1,,2 * * *"))
    intercept[IllegalArgumentException](Cron.parse("x 0 * * *"))
  }

  test("Cron: dow 7 is Sunday (vixie), including in ranges") {
    val sunday7 = Cron.parse("0 0 * * 7")
    // 2024-03-03 is a Sunday
    assert(sunday7.next(LocalDateTime.parse("2024-03-01T00:00")) ==
      LocalDateTime.parse("2024-03-03T00:00"))
    val friToSun = Cron.parse("0 0 * * 5-7")
    assert(friToSun.next(LocalDateTime.parse("2024-03-03T00:00")) ==
      LocalDateTime.parse("2024-03-08T00:00")) // next Friday
  }

  test("Cron: restricted dom AND dow combine with OR (standard cron day rule)") {
    val c = Cron.parse("0 0 13 * 5")
    // 2024-09-01 is a Sunday: next fires are Fri 09-06, then the 13th
    // (which is also a Friday), then Fri 09-20
    assert(c.next(LocalDateTime.parse("2024-09-01T00:00")) ==
      LocalDateTime.parse("2024-09-06T00:00"))
    assert(c.next(LocalDateTime.parse("2024-09-06T00:00")) ==
      LocalDateTime.parse("2024-09-13T00:00"))
    assert(c.next(LocalDateTime.parse("2024-09-13T00:00")) ==
      LocalDateTime.parse("2024-09-20T00:00"))
    // and a non-Friday 13th still fires: 2024-10-13 is a Sunday
    assert(c.next(LocalDateTime.parse("2024-10-12T00:00")) ==
      LocalDateTime.parse("2024-10-13T00:00"))
  }

  test("Dag.NeverRetry opts a task out of spec-level retry defaults") {
    var attempts = 0
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01").copy(retries = 3, retryDelay = Duration.ofMinutes(5)),
      _ => Seq(Dag.Task("no-retry", retries = Dag.NeverRetry)(() => {
        attempts += 1; throw new RuntimeException("side-effecting")
      })),
      sleep = _ => fail("must not back off a never-retry task"))
    val runs = sched.drain(LocalDateTime.parse("2024-03-02T00:00"))
    assert(!runs.head.report.succeeded && attempts == 1)
  }

  test("catchup=true backfills every closed interval, one per tick at max_active_runs=1") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    var failOnce = true
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01", catchup = true),
      ds => Seq(Dag.Task("load")(() => {
        if (ds == "2024-03-02" && failOnce) { failOnce = false; throw new RuntimeException("bad day") }
        ran += ds
      })),
      sleep = _ => fail("must not sleep"))
    val now = LocalDateTime.parse("2024-03-05T00:30")
    // intervals 03-01..03-04 closed; one dispatched per heartbeat
    assert(sched.tick(now).map(_.ds) == Seq("2024-03-01"))
    assert(sched.tick(now).map(_.ds) == Seq("2024-03-02"))
    assert(sched.tick(now).map(_.ds) == Seq("2024-03-03"))
    assert(sched.tick(now).map(_.ds) == Seq("2024-03-04"))
    assert(sched.tick(now).isEmpty) // backlog drained, nothing new closed
    // the failed day is reported failed, later days still ran
    assert(ran.toSeq == Seq("2024-03-01", "2024-03-03", "2024-03-04"))
    assert(!sched.runs.find(_.ds == "2024-03-02").get.report.succeeded)
    assert(sched.runs.count(_.report.succeeded) == 3)
  }

  test("catchup=false runs only the latest closed interval, then stays incremental") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01"),
      ds => Seq(Dag.Task("load")(() => ran += ds)))
    assert(sched.drain(LocalDateTime.parse("2024-03-05T00:30")).map(_.ds) ==
      Seq("2024-03-04")) // backlog 03-01..03-03 skipped
    assert(sched.drain(LocalDateTime.parse("2024-03-07T01:00")).map(_.ds) ==
      Seq("2024-03-05", "2024-03-06")) // post-start intervals all run
  }

  test("max_active_runs>1 dispatches a bounded batch per tick") {
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01", catchup = true).copy(maxActiveRuns = 3),
      ds => Seq(Dag.Task("load")(() => ())))
    val now = LocalDateTime.parse("2024-03-05T00:30")
    assert(sched.tick(now).map(_.ds) == Seq("2024-03-01", "2024-03-02", "2024-03-03"))
    assert(sched.tick(now).map(_.ds) == Seq("2024-03-04"))
  }

  test("retry backoff waits retry_delay between attempts via the injected clock") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var attempts = 0
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01")
        .copy(retries = 2, retryDelay = Duration.ofMinutes(5)),
      _ => Seq(Dag.Task("flaky")(() => {
        attempts += 1
        if (attempts < 3) throw new RuntimeException("flaky")
      })),
      sleep = ms => slept += ms)
    val runs = sched.drain(LocalDateTime.parse("2024-03-02T00:00"))
    assert(runs.map(_.ds) == Seq("2024-03-01"))
    assert(runs.head.report.succeeded && attempts == 3)
    assert(slept.toSeq == Seq(300000L, 300000L)) // two backoffs, zero real sleep
  }

  test("external sensor couples raw@00:00 -> core@02:00 across a failure day") {
    // Reference layout: ingest_raw_sales fires at 00:00, process_core_sales
    // at 02:00 and its first task senses raw's run for the same day
    // (execution_delta = 2h maps core's 02:00 logical date onto raw's 00:00).
    val rawRan = scala.collection.mutable.ArrayBuffer.empty[String]
    val coreRan = scala.collection.mutable.ArrayBuffer.empty[String]
    var rawFails = Set("2024-03-02")
    val raw = new Scheduled(
      ScheduleSpec(Cron.parse("0 0 * * *"), java.time.LocalDate.parse("2024-03-01"), catchup = true),
      ds => Seq(Dag.Task("load")(() => {
        if (rawFails(ds)) throw new RuntimeException(s"raw bad day $ds")
        rawRan += ds
      })))
    val core = new Scheduled(
      ScheduleSpec(Cron.parse("0 2 * * *"), java.time.LocalDate.parse("2024-03-01"), catchup = true),
      ds => Seq(Dag.Task("dims")(() => coreRan += ds)),
      sensors = Seq(ExternalSensor("wait_for_raw", raw,
        executionDelta = Duration.ofHours(2), timeout = Duration.ofHours(72))))

    // Day 1 closes: raw runs 03-01, then core's 03-01 sensor is satisfied.
    val d2 = LocalDateTime.parse("2024-03-02T02:30")
    assert(raw.drain(d2).map(_.ds) == Seq("2024-03-01"))
    assert(core.drain(d2).map(_.ds) == Seq("2024-03-01"))

    // Day 2 closes: raw's 03-02 run FAILS -> core's 03-02 must hold.
    val d3 = LocalDateTime.parse("2024-03-03T02:30")
    assert(!raw.drain(d3).head.report.succeeded)
    assert(core.drain(d3).isEmpty) // blocked on the failed upstream day
    assert(!coreRan.contains("2024-03-02"))

    // Day 3 closes: raw's 03-03 is green, so core's 03-03 dispatches PAST
    // the held 03-02 (depends_on_past=False).
    val d4 = LocalDateTime.parse("2024-03-04T02:30")
    assert(raw.drain(d4).map(_.ds) == Seq("2024-03-03"))
    assert(core.drain(d4).map(_.ds) == Seq("2024-03-03"))
    assert(!coreRan.contains("2024-03-02"))

    // Recovery: clear raw's failed day, let both catch up -> core's held
    // 03-02 fires once the upstream day is green.
    rawFails = Set.empty
    raw.clear(LocalDateTime.parse("2024-03-02T00:00"))
    assert(raw.drain(d4).map(_.ds) == Seq("2024-03-02"))
    assert(core.drain(d4).map(_.ds) == Seq("2024-03-02"))
    assert(rawRan.toSeq.sorted == Seq("2024-03-01", "2024-03-02", "2024-03-03"))
    assert(coreRan.toSeq.sorted == Seq("2024-03-01", "2024-03-02", "2024-03-03"))
    assert(core.runs.forall(_.report.succeeded))
  }

  test("external sensor timeout records a failed run whose tasks never fired") {
    val raw = new Scheduled(
      ScheduleSpec.daily("2024-03-01", catchup = true),
      _ => Seq(Dag.Task("load")(() => throw new RuntimeException("always down"))))
    var coreFired = false
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val core = new Scheduled(
      ScheduleSpec(Cron.parse("0 2 * * *"), java.time.LocalDate.parse("2024-03-01"), catchup = true),
      _ => Seq(Dag.Task("dims")(() => coreFired = true)),
      callbacks = Dag.Callbacks(onFailure = (id, _) => failures += id),
      sensors = Seq(ExternalSensor("wait_for_raw", raw,
        executionDelta = Duration.ofHours(2), timeout = Duration.ofHours(1))))

    val t0 = LocalDateTime.parse("2024-03-02T02:30")
    raw.drain(t0)
    assert(core.tick(t0).isEmpty) // blocked, within timeout -> held
    val later = core.tick(t0.plusHours(2)) // past the 1h sensor timeout
    assert(later.map(_.ds) == Seq("2024-03-01"))
    assert(!later.head.report.succeeded && !coreFired)
    assert(later.head.report.statuses("wait_for_raw").isInstanceOf[Dag.Failed])
    assert(later.head.report.statuses("dims") == Dag.Skipped)
    assert(failures.toSeq == Seq("wait_for_raw"))
  }

  test("failure day fires exactly one notification despite the transport failing twice") {
    // the reference's on_failure_callback -> webhook path: the DATA task
    // fails once; the NOTIFICATION transport is flaky (two 503s, then ok);
    // the schedule must emit exactly one delivered card, and the transport
    // trouble must not affect the run's own status or retries
    var sends = 0
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Notifier.Notification]
    val flaky = new Notifier.Transport {
      def send(n: Notifier.Notification): Unit = {
        sends += 1
        if (sends <= 2) throw new RuntimeException(s"503 attempt $sends")
        delivered += n
      }
    }
    val notifier = new Notifier(flaky, maxRetries = 2,
      retryDelay = Duration.ofSeconds(5), sleep = _ => ())
    var taskRuns = 0
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01"),
      _ => Seq(Dag.Task("load")(() => { taskRuns += 1; throw new RuntimeException("bad day") })),
      callbacks = Notifier.callbacks(notifier, "ingest_raw_sales", "2024-03-01"))
    val runs = sched.drain(LocalDateTime.parse("2024-03-02T00:00"))
    assert(!runs.head.report.succeeded)
    assert(taskRuns == 1)         // notification retries never re-run the task
    assert(sends == 3)            // two transport failures, then delivery
    assert(delivered.size == 1)   // exactly one notification
    assert(delivered.head.event == "failure" &&
      delivered.head.message.contains("'load'") &&
      delivered.head.message.contains("bad day"))
  }

  test("a task's own retry config wins over the spec defaults") {
    var attempts = 0
    val sched = new Scheduled(
      ScheduleSpec.daily("2024-03-01").copy(retries = 5, retryDelay = Duration.ofMinutes(5)),
      _ => Seq(Dag.Task("once", retries = 1)(() => { attempts += 1; throw new RuntimeException("no") })),
      sleep = _ => fail("task declared no delay"))
    val runs = sched.drain(LocalDateTime.parse("2024-03-02T00:00"))
    assert(!runs.head.report.succeeded && attempts == 2) // 1 retry, not 5
  }
}
