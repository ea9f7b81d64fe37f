package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Resample]]: grid construction, gap fill, forward fill, linear
  * interpolation — pinned against hand-computed expectations. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("daily grid: gaps materialize, ffill carries, interior gaps interpolate") {
    // key "a": days 0, 1, 4 observed (gap 2-3); key "b": single day
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00"), 10.0),
      ("a", ts("2024-01-01 11:00:00"), 2.0),
      ("a", ts("2024-01-02 09:00:00"), 30.0),
      ("a", ts("2024-01-05 23:59:59"), 60.0),
      ("b", ts("2024-03-10 00:00:00"), 5.0)
    ).toDF("k", "ts", "v")
    val out = Resample.resample(ev, "k", "ts", "v", 86400L)
      .orderBy("k", "bucket").collect()
    assert(out.length == 6, s"5 grid days for a + 1 for b, got ${out.length}")

    val a = out.filter(_.getString(0) == "a")
    val day0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(a.map(_.getLong(1)).toSeq == (0 until 5).map(day0 + _ * 86400L))
    assert(a.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L, 0L, 1L))
    // total: null on gaps; ffill: carries 30.0 across the gap
    assert(a.map(r => Option(r.get(3))).toSeq ==
      Seq(Some(12.0), Some(30.0), None, None, Some(60.0)))
    assert(a.map(_.getDouble(4)).toSeq == Seq(12.0, 30.0, 30.0, 30.0, 60.0))
    // interp: 30 → 60 over 3 steps: 40, 50 in the gap
    assert(a.map(_.getDouble(5)).toSeq == Seq(12.0, 30.0, 40.0, 50.0, 60.0))

    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b.head.getDouble(4) == 5.0 &&
      b.head.getDouble(5) == 5.0)
  }

  test("hourly step: bucket arithmetic is pure epoch floor, no calendar logic") {
    val ev = Seq(("k", ts("2024-06-15 13:59:59"), 1.0),
      ("k", ts("2024-06-15 14:00:00"), 2.0)).toDF("k", "ts", "v")
    val out = Resample.resample(ev, "k", "ts", "v", 3600L)
      .orderBy("bucket").collect()
    assert(out.length == 2)
    assert(out(1).getLong(1) - out(0).getLong(1) == 3600L)
    assert(out(0).getLong(1) % 3600 == 0)
  }

  test("null timestamps drop; values sum rounded to 6 decimals per bucket") {
    val ev = Seq(("k", ts("2024-01-01 00:00:00"), 0.1234567),
      ("k", ts("2024-01-01 01:00:00"), 0.1),
      ("k", null.asInstanceOf[Timestamp], 99.0)).toDF("k", "ts", "v")
    val out = Resample.resample(ev, "k", "ts", "v", 86400L).collect()
    assert(out.length == 1 && out.head.getDouble(3) == 0.223457)
  }

  test("plan shape: one keyed agg over events, grid from per-key min/max, window repair — no cartesian") {
    val ev = graft.Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val out = Resample.resample(ev, "user_id", "ts", "value", 86400L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad plan:\n$plan")
    // gaps exist and every grid row has a repaired value
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(2) == 0L), "expected gap rows in events")
    assert(rows.forall(r => !r.isNullAt(4) && !r.isNullAt(5)),
      "ffill/interp must cover every grid row (grid spans first→last)")
  }
}
