package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup: k rows per group, deterministic tie-break") {
    val df = Seq(("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 5.0), ("g", 4L, 1.0),
                 ("h", 5L, 7.0))
      .toDF("grp", "id", "score")
    val out = Analytics.topKPerGroup(df, Seq("grp"), "score", "id", 2)
      .orderBy("grp", "rank").select("id", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (2L, 2), (5L, 1))) // tie 10.0/10.0 → lower id first
  }

  test("topKPerGroupAgg == topKPerGroup on random data (ties included)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      // small score range forces real ties; several groups, k spanning
      // under- and over-full groups
      val rows = (1L to 200L).map(i =>
        (s"g${rnd.nextInt(6)}", i, rnd.nextInt(8).toDouble))
      val df = rows.toDF("grp", "id", "score")
      for (k <- Seq(1, 3, 50)) {
        val win = Analytics.topKPerGroup(df, Seq("grp"), "score", "id", k)
          .select("grp", "id", "score", "rank")
          .as[(String, Long, Double, Int)].collect().toSet
        val agg = Analytics.topKPerGroupAgg(df, Seq("grp"), "score", "id", k)
          .select("grp", "id", "score", "rank")
          .as[(String, Long, Double, Int)].collect().toSet
        assert(agg == win, s"k=$k: heap aggregate diverged from window")
      }
    }
  }

  test("topKPerGroupAgg: groups smaller than k emit all their rows") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 3.0)).toDF("grp", "id", "score")
    val out = Analytics.topKPerGroupAgg(df, Seq("grp"), "score", "id", 10)
      .orderBy("rank").select("id", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (2L, 2)))
  }

  test("topKPerGroupAgg plan: hash aggregate with map-side partial, no sort-window") {
    val df = spark.range(10000).select((col("id") % 50).cast("string").as("grp"),
      col("id").as("id"), (col("id") % 997).cast("double").as("score"))
    val out = Analytics.topKPerGroupAgg(df, Seq("grp"), "score", "id", 3)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.split("\n").exists(_.contains("Window ")),
      s"heap path must not window:\n$plan")
    // partial (merge) aggregation before the exchange is the entire point
    assert(plan.contains("partial_graft_topk") ||
      plan.contains("partial_topkrows") || plan.contains("Partial"),
      s"no map-side partial aggregation found:\n$plan")
  }

  test("graft_topk is callable from SQL") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 9.0), ("g", 3L, 7.0))
      .toDF("grp", "id", "score")
    df.createOrReplaceTempView("topk_in")
    val out = spark.sql(
      """SELECT grp, size(graft_topk(struct(score, -id, id), 2)) AS n
        |FROM topk_in GROUP BY grp""".stripMargin)
      .as[(String, Int)].collect().toSeq
    assert(out == Seq(("g", 2)))
  }

  test("runningOrderStats: exact cents accumulation") {
    val orders = Seq(
      (1L, 10L, "2024-01-01", 10.50), (1L, 11L, "2024-01-02", 20.25)
    ).toDF("o_custkey", "o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val out = Analytics.runningOrderStats(orders).orderBy("order_seq")
      .select("total_cents", "running_cents", "avg3_cents")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1050L, 1050L, 1050.0), (2025L, 3075L, 1537.5)))
  }

  test("salesRollup produces leaf, subtotal and grand-total levels") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val p = spark.read.parquet(s"$sf001/part.parquet")
    val out = Analytics.salesRollup(li, o, p).cache()
    val grand = out.where($"year".isNull && $"category".isNull)
    val yearLevels = out.where($"year".isNotNull && $"category".isNull)
    assert(grand.count() == 1)
    assert(yearLevels.count() == o.select(year($"o_orderdate")).distinct().count())
    val total = grand.select("n_rows").as[Long].head()
    assert(total == li.count())
  }

  test("statusPivot fills absent combinations with 0") {
    val orders = Seq(("1-URGENT", "F"), ("1-URGENT", "F"), ("5-LOW", "O"))
      .toDF("o_orderpriority", "o_orderstatus")
    val out = Analytics.statusPivot(orders, Seq("F", "O", "P"))
      .orderBy("o_orderpriority").collect()
    assert(out(0).getAs[Long]("F") == 2 && out(0).getAs[Long]("P") == 0)
    assert(out(1).getAs[Long]("O") == 1 && out(1).getAs[Long]("F") == 0)
  }

  test("percentiles: interpolation matches hand computation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)).toDF("g", "v")
    val out = Analytics.percentiles(df, "g", "v", Seq(0.5)).collect()(0)
    assert(out.getAs[Double]("p50") == 2.5) // (n-1)*0.5 = 1.5 → 2 + 0.5
    assert(out.getAs[Long]("n") == 4)
  }

  test("semiAntiCounts partitions customers exactly") {
    val c = spark.read.parquet(s"$sf001/customer.parquet")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val out = Analytics.semiAntiCounts(c, o)
    val tot = out.agg(sum("n_customers"), sum("n_with_orders") + sum("n_without_orders"))
      .as[(Long, Long)].head()
    assert(tot._1 == c.count() && tot._2 == c.count())
  }

  test("sessionize splits on gap") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1.0, 1L),
      (1L, "2024-01-01 10:10:00", 2.0, 2L), // same session (10 min)
      (1L, "2024-01-01 11:00:00", 3.0, 3L)  // 50 min gap → new session
    ).toDF("user_id", "ts_s", "value", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Sessionize.sessionize(ev, "user_id", "ts", "value", 30, "event_id")
      .orderBy("session_seq")
      .select("n_events", "total_value").as[(Long, Double)].collect().toSeq
    assert(out == Seq((2L, 3.0), (1L, 3.0)))
  }

  test("funnel: strictly sequential — out-of-order steps do not count") {
    def ev(rows: (Long, String, String)*) =
      rows.toSeq.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val events = ev(
      // user 1: full ordered funnel
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // user 2: purchase BEFORE the click -> stops at click
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:01:00", "purchase"),
      (2L, "2024-01-01 10:05:00", "click"),
      // user 3: click only, never viewed -> counts nowhere
      (3L, "2024-01-01 10:00:00", "click"))
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .select("step", "event_type", "n_users").as[(Int, String, Long)]
      .collect().toSeq
    assert(out == Seq((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
    val conv = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step").select("conv_from_prev").as[Double].collect().toSeq
    assert(conv == Seq(1.0, 1.0, 0.5))
  }

  test("funnel with a conversion window drops late completions") {
    def ev(rows: (Long, String, String)*) =
      rows.toSeq.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),   // inside the hour
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 12:00:00", "click"))   // 2h after the first view
    val bounded = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"), within = Some("1 hour"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(bounded == Seq(2L, 1L))
    val unbounded = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(unbounded == Seq(2L, 2L))
  }

  test("funnel anchors: first-event vs per-step windows count differently") {
    def ev(rows: (Long, String, String)*) =
      rows.toSeq.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val events = ev(
      // user 1: each hop 40 min apart — purchase is 80 min after the first
      // view (outside a 1h first-event window) but 40 min after the click
      // (inside a 1h per-step window)
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:40:00", "click"),
      (1L, "2024-01-01 11:20:00", "purchase"),
      // user 2: everything within 30 min of the view — converts under both
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:10:00", "click"),
      (2L, "2024-01-01 10:30:00", "purchase"))
    def counts(anchor: Behavior.ConversionAnchor) =
      Behavior.funnel(events, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"),
          within = Some("1 hour"), anchor = anchor)
        .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(counts(Behavior.AnchorFirst) == Seq(2L, 2L, 1L))
    assert(counts(Behavior.AnchorPrevStep) == Seq(2L, 2L, 2L))
  }

  test("cohortRetention: offsets measured from each user's first week") {
    def ev(rows: (Long, String)*) =
      rows.toSeq.toDF("user_id", "ts_s")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    // weeks: 2024-01-01 (Mon) and 2024-01-08
    val events = ev(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-09 10:00:00"), // retained
      (2L, "2024-01-03 10:00:00"),                              // churned
      (3L, "2024-01-10 10:00:00"))                              // later cohort
    val out = Behavior.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select("week_offset", "n_active", "cohort_size", "retention")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0, 2L, 2L, 1.0), (1, 1L, 2L, 0.5), (0, 1L, 1L, 1.0)))
  }
}
