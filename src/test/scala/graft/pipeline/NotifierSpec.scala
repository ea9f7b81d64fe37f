package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Notifier.Notification

class NotifierSpec extends AnyFunSuite {

  private def aNote = Notification("failure", "load", "Task 'load' failed.", "FF0000")

  test("delivers once after transient transport failures; bounded backoff") {
    var sends = 0
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Notification]
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new Notifier.Transport {
      def send(n: Notification): Unit = {
        sends += 1
        if (sends <= 2) throw new RuntimeException(s"503 attempt $sends")
        delivered += n
      }
    }
    val n = new Notifier(flaky, maxRetries = 2,
      retryDelay = java.time.Duration.ofSeconds(5), sleep = slept += _)
    assert(n.notify(aNote))
    assert(sends == 3 && delivered.size == 1) // exactly one delivery
    assert(slept.toSeq == Seq(5000L, 5000L))  // backoff between attempts only
  }

  test("exhausted retries: never throws, gives up exactly once, reports false") {
    var giveUps = 0
    val down = new Notifier.Transport {
      def send(n: Notification): Unit = throw new RuntimeException("always down")
    }
    val n = new Notifier(down, maxRetries = 2,
      retryDelay = java.time.Duration.ZERO,
      onGiveUp = (_, e) => { giveUps += 1; assert(e.getMessage == "always down") })
    assert(!n.notify(aNote))
    assert(giveUps == 1)
  }

  test("a hung transport attempt times out instead of stalling the pipeline") {
    var attempts = 0
    val hung = new Notifier.Transport {
      def send(n: Notification): Unit = { attempts += 1; Thread.sleep(60000) }
    }
    var giveUp: Throwable = null
    val n = new Notifier(hung, maxRetries = 1,
      retryDelay = java.time.Duration.ZERO,
      attemptTimeout = java.time.Duration.ofMillis(100),
      onGiveUp = (_, e) => giveUp = e)
    val t0 = System.nanoTime()
    assert(!n.notify(aNote))
    assert((System.nanoTime() - t0) / 1e6 < 5000) // both attempts bounded
    assert(attempts == 2)
    assert(giveUp.isInstanceOf[java.util.concurrent.TimeoutException])
  }

  test("callbacks compose the reference's success/failure card messages") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Notification]
    val n = new Notifier(new Notifier.Transport {
      def send(x: Notification): Unit = seen += x
    })
    val cb = Notifier.callbacks(n, "process_core_sales", "2024-03-01")
    cb.onSuccess("dims")
    cb.onFailure("facts", new RuntimeException("boom"))
    assert(seen.map(_.event).toSeq == Seq("success", "failure"))
    assert(seen(0).message ==
      "Task 'dims' in DAG 'process_core_sales' succeeded on 2024-03-01.")
    assert(seen(0).themeColor == "00FF00")
    assert(seen(1).message ==
      "Task 'facts' in DAG 'process_core_sales' failed on 2024-03-01. Error: boom")
    assert(seen(1).themeColor == "FF0000")
  }
}
