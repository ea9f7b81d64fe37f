package graft.operators

import graft.SparkSpec

/** [[Expectations]]: hand-computed violation counts for every check
  * type, the predicate null rule, the anti-join FK check, and the loud
  * gate. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private lazy val df = Seq(
    (Option(1L), Option(5.0), "A", 1),
    (Option(1L), Option(5.0), "A", 1), // duplicate key (1,1)
    (Option(2L), Option(99.0), "X", 1), // range + set violations
    (None, None, "A", 2),               // null key
    (Option(9L), Option(3.0), "N", 1)   // key 9 absent from ref
  ).toDF("k", "v", "flag", "line")

  private lazy val ref = Seq(1L, 2L).toDF("rk")

  test("every check type counts hand-computed violations") {
    val rows = Expectations.run(df, Seq(
        NotNull("k"),
        InRange("v", 0.0, 10.0),
        InSet("flag", Seq("A", "N", "R")),
        UniqueKey(Seq("k", "line")),
        RefIntegrity("k", ref, "rk"),
        Predicate("v_lt_k_times_10", $"v" < $"k" * 10)))
      .as[(String, Long, Boolean)].collect().toList
    assert(rows == List(
      ("in_set(flag)", 1L, false),
      ("not_null(k)", 1L, false),
      // null v and null k rows: predicate null => violation (3 rows: the
      // None row, plus v=99 >= 20? no: 99 < 2*10 is false => violation;
      // 5 < 10 true, 5 < 10 true, 3 < 90 true)
      ("predicate(v_lt_k_times_10)", 2L, false),
      ("range(v,0.0,10.0)", 1L, false),
      ("ref(k->rk)", 1L, false),
      ("unique(k,line)", 1L, false)))
  }

  test("a clean table passes everything; requirePass is silent then loud") {
    val clean = Expectations.run(df.where($"k".isNotNull && $"k" =!= 2L && $"k" =!= 9L),
      Seq(NotNull("k"), InRange("v", 0.0, 10.0)))
    assert(clean.where(!$"pass").count() == 0)
    requirePass(clean)
    val e = intercept[IllegalArgumentException] {
      requirePass(Expectations.run(df, Seq(NotNull("k"))))
    }
    assert(e.getMessage.contains("not_null(k)") && e.getMessage.contains("1 violations"))
  }

  test("freshness: fresh passes, stale fails, empty/all-null is stale by definition") {
    import java.sql.Timestamp
    def run1(rows: Seq[Option[Timestamp]], lagDays: Int): (Long, Boolean) =
      Expectations.run(rows.toDF("ts"),
          Seq(Freshness("ts", "2024-03-01 00:00:00", lagDays)))
        .as[(String, Long, Boolean)].head() match { case (_, v, p) => (v, p) }
    val recent = Some(Timestamp.valueOf("2024-02-25 12:00:00"))
    val old = Some(Timestamp.valueOf("2023-11-01 00:00:00"))
    assert(run1(Seq(old, recent), 10) == ((0L, true)))   // newest within 10d
    assert(run1(Seq(old), 10) == ((1L, false)))          // stale
    assert(run1(Seq(None), 10) == ((1L, false)))         // all-null: stale
    assert(run1(Seq.empty[Option[Timestamp]], 10) == ((1L, false))) // empty: stale
  }

  test("quality gate in a DAG: a red report blocks publish, downstream skipped") {
    import graft.pipeline.Dag
    // transform -> dq gate -> publish: the gate is just requirePass as a
    // Dag task, so a failing contract stops the publish exactly like any
    // failed upstream (downstream Skipped, independent branches unaffected)
    var published = false
    def tasks(checks: Seq[Check]) = Seq(
      Dag.Task("transform")(() => ()),
      Dag.Task("dq_gate", deps = Seq("transform"))(() =>
        requirePass(Expectations.run(df, checks))),
      Dag.Task("publish", deps = Seq("dq_gate"))(() => published = true))

    val red = Dag.run(tasks(Seq(NotNull("k"))))
    assert(!red.succeeded && !published)
    assert(red.statuses("publish") == Dag.Skipped)
    assert(red.statuses("dq_gate").isInstanceOf[Dag.Failed])

    val green = Dag.run(tasks(Seq(InSet("flag", Seq("A", "N", "R", "X")))))
    assert(green.succeeded && published)
  }

  test("ref-only check list works (no scalar aggregation pass)") {
    val rows = Expectations.run(df, Seq(RefIntegrity("k", ref, "rk")))
      .as[(String, Long, Boolean)].collect().toList
    assert(rows == List(("ref(k->rk)", 1L, false)))
  }
}
