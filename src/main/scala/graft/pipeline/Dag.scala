package graft.pipeline

import scala.collection.mutable

/** Minimal DAG executor: the orchestration semantics the reference gets
  * from Airflow (topological ordering, upstream gating, retries, backfill
  * over logical dates), re-expressed as a library so a Spark job can embed
  * its own pipeline. Within one schedule, cross-DAG sensors collapse into
  * ordinary dependency edges; across schedules (the reference's
  * ExternalTaskSensor waiting on another DAG's `end` task —
  * dags/process_core_sales.py:58-66) use [[Scheduler.ExternalSensor]].
  *
  * Tasks run sequentially in deterministic topological order (lexicographic
  * among ready tasks). Spark supplies the intra-task parallelism; the DAG
  * layer only sequences writes, mirroring the reference where each BigQuery
  * job is itself massively parallel.
  */
object Dag {

  /** Explicit opt-out from scheduler-level retry defaults: `retries = 0`
    * reads as "unspecified" to [[Scheduler.Scheduled]]'s default_args
    * application; a task that must NEVER retry (non-idempotent side
    * effects) under a retrying spec declares `retries = Dag.NeverRetry`. */
  val NeverRetry: Int = -1

  final case class Task(id: String, deps: Seq[String] = Nil, retries: Int = 0,
                        retryDelay: java.time.Duration = java.time.Duration.ZERO)
                       (val run: () => Unit)

  sealed trait Status
  case object Success extends Status
  final case class Failed(attempts: Int, error: Throwable) extends Status
  case object Skipped extends Status
  final case class Report(statuses: Map[String, Status], order: Seq[String]) {
    def succeeded: Boolean = statuses.values.forall(_ == Success)
  }

  def validate(tasks: Seq[Task]): Unit = {
    val ids = tasks.map(_.id)
    require(ids.distinct.size == ids.size, s"duplicate task ids in ${ids.sorted}")
    val known = ids.toSet
    for (t <- tasks; d <- t.deps)
      require(known.contains(d), s"task ${t.id} depends on unknown task $d")
  }

  /** Lifecycle hooks — the reference wires MS Teams webhooks into Airflow's
    * on_success_callback/on_failure_callback (plugins/ms_teams_notification
    * .py); here any side channel plugs in as a function. */
  final case class Callbacks(
      onSuccess: String => Unit = _ => (),
      onFailure: (String, Throwable) => Unit = (_, _) => ())

  /** Run all tasks respecting dependencies; downstream of a failure is
    * Skipped, independent branches still run.
    *
    * @param sleep how to wait out a task's `retryDelay` between attempts
    *              (reference `retry_delay=timedelta(minutes=5)`) —
    *              injectable so schedule tests never really sleep. */
  def run(tasks: Seq[Task], callbacks: Callbacks = Callbacks(),
          sleep: Long => Unit = Thread.sleep): Report = {
    validate(tasks)
    val byId = tasks.map(t => t.id -> t).toMap
    val statuses = mutable.Map[String, Status]()
    val order = mutable.ArrayBuffer[String]()
    val pending = mutable.SortedSet[String]() ++ byId.keys

    // Detect cycles: repeatedly pick the first ready task; if none is ready
    // and tasks remain, the remainder is cyclic.
    while (pending.nonEmpty) {
      pending.find(id => byId(id).deps.forall(d => statuses.get(d).contains(Success))) match {
        case Some(id) =>
          pending -= id
          order += id
          statuses(id) = execute(byId(id), sleep) match {
            case Success => callbacks.onSuccess(id); Success
            case f @ Failed(_, e) => callbacks.onFailure(id, e); f
            case other => other
          }
        case None =>
          val blocked = pending.filter(id =>
            byId(id).deps.exists(d => statuses.get(d).exists(_ != Success)))
          if (blocked.nonEmpty) {
            blocked.foreach { id => pending -= id; statuses(id) = Skipped; order += id }
          } else {
            throw new IllegalStateException(s"dependency cycle among ${pending.mkString(", ")}")
          }
      }
    }
    Report(statuses.toMap, order.toSeq)
  }

  private def execute(t: Task, sleep: Long => Unit): Status = {
    val maxRetries = math.max(0, t.retries) // NeverRetry (-1) still runs once
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try { t.run(); return Success }
      catch {
        case e: Throwable =>
          lastErr = e; attempt += 1
          if (attempt <= maxRetries && !t.retryDelay.isZero)
            sleep(t.retryDelay.toMillis) // back off before the next attempt
      }
    }
    Failed(attempt, lastErr)
  }

  /** Backfill: run the date-parameterized pipeline once per logical date,
    * in order (reference: airflow backfill over `{{ ds }}`). */
  def backfill(dates: Seq[String])(mkTasks: String => Seq[Task]): Map[String, Report] =
    dates.map(d => d -> run(mkTasks(d))).toMap
}
