package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSpec

/** Golden-record survivorship ([[Survivorship.golden]]): last non-null
  * wins PER ATTRIBUTE (a fresher record's null never erases an older
  * known value), ties deterministic, and the plan is one aggregation —
  * no window holding per-entity sorted state. */
class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("per-attribute last-non-null, all-null attribute stays null, ties break by id") {
    val recs = Seq(
      // entity 1: phone known only in the OLDEST record; email updated later
      (1L, ts(10), 100L, Some("p1"), Some("a@x")),
      (1L, ts(20), 101L, None, Some("b@x")),
      (1L, ts(30), 102L, None, None),
      // entity 2: tie on ts — higher event id wins
      (2L, ts(10), 200L, Some("old"), None),
      (2L, ts(50), 201L, Some("tie-lo"), None),
      (2L, ts(50), 202L, Some("tie-hi"), None),
      // entity 3: attribute never present
      (3L, ts(5), 300L, None, None)
    ).toDF("id", "at", "rid", "phone", "email")
    val g = Survivorship.golden(recs, Seq("id"), "at", "rid",
        Seq("phone", "email"))
      .as[(Long, Option[String], Option[String], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(g(1L) == ((Some("p1"), Some("b@x"), 3L)),
      "newest record's nulls must not erase older known values")
    assert(g(2L) == ((Some("tie-hi"), None, 3L)))
    assert(g(3L) == ((None, None, 1L)))
  }

  test("the plan is a single aggregation — no WindowExec") {
    val recs = Seq((1L, ts(1), 1L, Some("x"))).toDF("id", "at", "rid", "v")
    val plan = Survivorship.golden(recs, Seq("id"), "at", "rid", Seq("v"))
      .queryExecution.executedPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "survivorship must ride hash aggregation, not a window")
  }

  test("value column colliding with key/order/tie refuses") {
    val recs = Seq((1L, ts(1), 1L)).toDF("id", "at", "rid")
    intercept[IllegalArgumentException] {
      Survivorship.golden(recs, Seq("id"), "at", "rid", Seq("at"))
    }
  }
}
