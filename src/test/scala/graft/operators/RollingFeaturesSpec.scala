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

  test("withStd: population moments from exact cent sums, hand-computed") {
    // window rows {1, 2, 3, 6}: mean 3.0, var (4+1+0+9)/4 = 3.5
    val ev = Seq(("u", ts("2024-01-01 00:00:00"), 1.0),
      ("u", ts("2024-01-01 00:00:01"), 2.0),
      ("u", ts("2024-01-01 00:00:02"), 3.0),
      ("u", ts("2024-01-01 00:00:03"), 6.0)).toDF("k", "ts", "v")
    val out = RollingFeatures.trailing(ev, "k", "ts", "v",
        Seq(RollingFeatures.Day), withStd = true)
      .orderBy("sec").collect()
    val last = out.last
    assert(last.getDouble(last.fieldIndex("mean_1d")) == 3.0)
    assert(last.getDouble(last.fieldIndex("sd_1d")) == math.sqrt(3.5))
    // constant series: sd exactly 0 (greatest() guards FP cancellation)
    val const = Seq(("u", ts("2024-01-01 00:00:00"), 5.0),
      ("u", ts("2024-01-01 00:00:01"), 5.0)).toDF("k", "ts", "v")
    val c = RollingFeatures.trailing(const, "k", "ts", "v",
      Seq(RollingFeatures.Day), withStd = true).orderBy("sec").collect()
    assert(c.last.getDouble(c.last.fieldIndex("sd_1d")) == 0.0)
  }

  test("anomalies: a planted spike flags, steady traffic does not, thin windows never flag") {
    val steady = (0 until 20).map(i =>
      ("u", ts(f"2024-01-01 ${i / 3}%02d:${(i * 7) % 60}%02d:00"), 10.0 + (i % 3)))
    val spike = Seq(("u", ts("2024-01-01 07:30:00"), 500.0))
    val ev = (steady ++ spike).toDF("k", "ts", "v")
    val flagged = RollingFeatures.anomalies(ev, "k", "ts", "v",
      RollingFeatures.Day, z = 3.0, minN = 5L)
    val rows = flagged.select("v").as[Double].collect()
    assert(rows.toSeq == Seq(500.0), s"only the spike flags, got ${rows.toSeq}")
    // a 3-row key never flags under minN=5 even with a wild value
    val thin = Seq(("t", ts("2024-01-01 00:00:00"), 1.0),
      ("t", ts("2024-01-01 00:01:00"), 1.0),
      ("t", ts("2024-01-01 00:02:00"), 999.0)).toDF("k", "ts", "v")
    assert(RollingFeatures.anomalies(thin, "k", "ts", "v",
      RollingFeatures.Day, z = 3.0, minN = 5L).count() == 0)
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

  test("Σc² past the long-exact bound raises loudly instead of silently wrapping") {
    // |cents| = 10^10 ⇒ c² = 10^20 > 9·10^18 in a single-row window —
    // the guard must turn the would-be wrap into an error (verdict r17)
    val huge = Seq(("u", ts("2024-01-01 00:00:00"), 1.0e8),
      ("u", ts("2024-01-01 00:01:00"), 1.0e8)).toDF("k", "ts", "v")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // ANSI on (the default): the multiply itself raises before the guard
    val ansi = intercept[Exception] {
      RollingFeatures.trailing(huge, "k", "ts", "v",
        Seq(RollingFeatures.Day), withStd = true).collect()
    }
    assert(messages(ansi).exists(m => m.contains("ARITHMETIC_OVERFLOW") ||
      m.contains("long-exact bound")), s"wrong error: ${messages(ansi)}")
    // ANSI off: the silent-wrap regime — the guard must still raise
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val e = intercept[Exception] {
        RollingFeatures.trailing(huge, "k", "ts", "v",
          Seq(RollingFeatures.Day), withStd = true).collect()
      }
      assert(messages(e).exists(_.contains("long-exact bound")),
        s"wrong error: ${messages(e)}")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)

    // values inside the bound are untouched by the guard
    val ok = Seq(("u", ts("2024-01-01 00:00:00"), 12.5),
      ("u", ts("2024-01-01 00:01:00"), 12.5)).toDF("k", "ts", "v")
    val rows = RollingFeatures.trailing(ok, "k", "ts", "v",
      Seq(RollingFeatures.Day), withStd = true).collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Double]("sd_1d") == 0.0))
  }
}
