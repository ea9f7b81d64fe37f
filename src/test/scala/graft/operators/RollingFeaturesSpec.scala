package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RollingFeatures]]: trailing RANGE frames with cent-exact sums,
  * same-second peers, and the one-exchange multi-horizon plan. */
class RollingFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("trailing counts/sums: inclusive horizon edge, expiry past it, hand-computed") {
    val ev = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1.0),
      ("u", ts("2024-01-01 12:00:00"), 2.0),
      ("u", ts("2024-01-02 00:00:00"), 4.0),   // exactly 86400s after row 1: inclusive
      ("u", ts("2024-01-10 00:00:00"), 8.0)    // everything expired
    ).toDF("k", "ts", "v")
    val out = RollingFeatures.trailing(ev, "k", "ts", "v",
        Seq(RollingFeatures.Day)).orderBy("sec").collect()
    assert(out.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L, 1L), "n_1d")
    assert(out.map(_.getDouble(5)).toSeq == Seq(1.0, 3.0, 7.0, 8.0), "v_1d")
    assert(out.map(_.getDouble(6)).toSeq ==
      Seq(1.0, 1.5, 7.0 / 3.0, 8.0), "avg_1d")
  }

  test("same-second peers all see the full peer group (RANGE, not ROWS)") {
    val t0 = ts("2024-05-05 05:05:05")
    val ev = Seq(("u", t0, 1.0), ("u", t0, 2.0), ("u", t0, 4.0))
      .toDF("k", "ts", "v")
    val out = RollingFeatures.trailing(ev, "k", "ts", "v",
      Seq(RollingFeatures.Day)).collect()
    assert(out.forall(_.getLong(4) == 3L))
    assert(out.forall(_.getDouble(5) == 7.0))
  }

  test("cent-exact: sums of awkward decimals have no FP drift; null ts drops; null value counts in n only") {
    val ev = Seq[(String, Timestamp, java.lang.Double)](
      ("u", ts("2024-01-01 00:00:00"), 0.1),
      ("u", ts("2024-01-01 00:00:01"), 0.2),
      ("u", ts("2024-01-01 00:00:02"), 0.3),
      ("u", ts("2024-01-01 00:00:03"), null),
      ("u", null, 9.0)
    ).toDF("k", "ts", "v")
    val out = RollingFeatures.trailing(ev, "k", "ts", "v",
      Seq(RollingFeatures.Day)).orderBy("sec").collect()
    assert(out.length == 4, "null-ts row must drop")
    assert(out(2).getDouble(5) == 0.6, "0.1+0.2+0.3 exactly (cents)")
    assert(out(3).getLong(4) == 4L && out(3).getDouble(5) == 0.6)
  }

  test("multi-horizon plan: one exchange, one sort, no matter how many frames") {
    val ev = graft.Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val out = RollingFeatures.trailing(ev, "user_id", "ts", "value",
      Seq(RollingFeatures.Day, RollingFeatures.Week, RollingFeatures.Month))
    val plan = out.queryExecution.executedPlan
    def countNodes(p: org.apache.spark.sql.execution.SparkPlan,
                   pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      val self = if (pred(p)) 1 else 0
      self + (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          countNodes(a.executedPlan, pred)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          countNodes(q.plan, pred)
        case other => other.children.map(countNodes(_, pred)).sum
      })
    }
    out.collect()
    val shuffles = countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    val sorts = countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    assert(shuffles == 1, s"expected 1 exchange for 3 horizons, got $shuffles")
    assert(sorts == 1, s"expected 1 sort for 3 horizons, got $sorts")
    // horizons nest: wider horizons can only see MORE
    assert(out.where(col("n_7d") < col("n_1d")).count() == 0)
    assert(out.where(col("n_30d") < col("n_7d")).count() == 0)
  }
}
