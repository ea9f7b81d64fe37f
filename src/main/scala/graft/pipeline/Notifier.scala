package graft.pipeline

/** Delivery-reliable notification channel behind [[Dag.Callbacks]] — the
  * logic half of the reference's MS-Teams webhook plugin
  * (`plugins/ms_teams_webhook_hook.py` / `ms_teams_webhook_operator.py`,
  * wired through `on_failure_callback`/`on_success_callback` in
  * `dags/process_core_sales.py:29-30`). The transport (an HTTP POST in the
  * reference) is pluggable and stubbed in tests — this class owns the
  * delivery semantics the reference delegates to Airflow's machinery:
  *
  *  - bounded retries with a fixed backoff (injectable sleep, like
  *    [[Dag.run]]'s);
  *  - a per-attempt timeout, so a hung webhook endpoint cannot stall the
  *    pipeline that is trying to report about itself;
  *  - never throws into the caller: a notification failure must not fail
  *    (or retry) the DATA task it reports on — Airflow logs and swallows
  *    callback exceptions, and so does this (via `onGiveUp`).
  */
object Notifier {

  /** One event to deliver. `themeColor` mirrors the reference's
    * green/red success/failure cards. */
  final case class Notification(event: String, taskId: String,
                                message: String, themeColor: String)

  /** One delivery attempt — throw to signal failure. Runs on a daemon
    * thread so a hung attempt can be abandoned at `attemptTimeout`. */
  trait Transport extends Serializable {
    def send(n: Notification): Unit
  }

  /** Build the reference's callback messages for a DAG run
    * (`ms_teams_notification.py:32,60`). */
  def callbacks(notifier: Notifier, dagId: String, execDate: String): Dag.Callbacks =
    Dag.Callbacks(
      onSuccess = taskId => notifier.notify(Notification(
        "success", taskId,
        s"Task '$taskId' in DAG '$dagId' succeeded on $execDate.", "00FF00")),
      onFailure = (taskId, e) => notifier.notify(Notification(
        "failure", taskId,
        s"Task '$taskId' in DAG '$dagId' failed on $execDate. " +
          s"Error: ${String.valueOf(e.getMessage).take(500)}", "FF0000")))
}

/** @param transport one delivery attempt; throws on failure
  * @param maxRetries additional attempts after the first (2 = up to 3 sends)
  * @param retryDelay wait between attempts
  * @param attemptTimeout give up on an attempt that neither returns nor
  *   throws within this window (the attempt thread is interrupted and
  *   abandoned — daemon, so it cannot pin shutdown)
  * @param sleep injectable so tests never really wait
  * @param onGiveUp terminal-failure hook (default: stderr) — called once
  *   when all attempts are exhausted; exceptions from it are swallowed too
  */
final class Notifier(transport: Notifier.Transport,
                     maxRetries: Int = 2,
                     retryDelay: java.time.Duration = java.time.Duration.ofSeconds(5),
                     attemptTimeout: java.time.Duration = java.time.Duration.ofSeconds(10),
                     sleep: Long => Unit = Thread.sleep,
                     onGiveUp: (Notifier.Notification, Throwable) => Unit =
                       (n, e) => System.err.println(
                         s"[notifier] giving up on ${n.event}:'${n.taskId}': $e")) {
  require(maxRetries >= 0, s"maxRetries=$maxRetries must be >= 0")

  /** Deliver with retries; returns true when an attempt succeeded. Never
    * throws. */
  def notify(n: Notifier.Notification): Boolean = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try { attemptOnce(n); return true }
      catch {
        case e: Throwable =>
          lastErr = e; attempt += 1
          if (attempt <= maxRetries && !retryDelay.isZero) sleep(retryDelay.toMillis)
      }
    }
    try onGiveUp(n, lastErr) catch { case _: Throwable => () }
    false
  }

  /** One attempt under the timeout: the send runs on a daemon thread; a
    * timeout interrupts and abandons it (an HTTP transport should ALSO set
    * socket timeouts — this is the backstop for ones that do not).
    *
    * Delivery on timeout is AT-LEAST-ONCE: `cancelled` stops an abandoned
    * thread that has not yet entered `send`, but one already inside a slow
    * `send` cannot be unsent — if it later completes AND a retry also
    * delivers, the endpoint sees the notification twice. Exactly-once
    * would need a transport-side idempotency key; for status cards,
    * duplicates are the right trade against losing the notification. */
  private def attemptOnce(n: Notifier.Notification): Unit = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val done = new java.util.concurrent.CountDownLatch(1)
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      try { if (!cancelled.get()) transport.send(n) }
      catch { case e: Throwable => err.set(e) }
      finally done.countDown()
    }, "graft-notifier-attempt")
    t.setDaemon(true)
    t.start()
    if (!done.await(attemptTimeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)) {
      cancelled.set(true)
      t.interrupt()
      throw new java.util.concurrent.TimeoutException(
        s"notification attempt exceeded ${attemptTimeout.toMillis} ms")
    }
    if (err.get() != null) throw err.get()
  }
}
