package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-shape assertions: plan properties that make or break 100 TB runs. */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate: join plan has no shuffle exchange") {
    val wh = Files.createTempDirectory("graft-buckets")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/orders_b")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("packShards maxStratumDocs: a giant stratum packs through sub-windows") {
    // one 100k-doc stratum plus a small one; every doc is 3 tokens so the
    // expected max shard id per sub-stratum is exact arithmetic
    val docs = spark.range(100000)
      .select(col("id"), lit("alpha beta gamma").as("text"), lit("web").as("stratum"))
      .union(spark.range(100000, 100050)
        .select(col("id"), lit("alpha beta gamma").as("text"), lit("books").as("stratum")))
    val packed = CorpusOps.packShards(docs, "id", "text", "stratum",
      budgetTokens = 3000, maxStratumDocs = Some(10000L))
    // the window must partition on the SUB key, not the raw stratum —
    // otherwise the 100k stratum still serializes through one partition
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(pack_stratum"),
      s"packing window should partition on pack_stratum:\n$plan")
    val subs = packed.groupBy("stratum", "pack_stratum")
      .agg(count(lit(1)).as("n"), max(col("shard_id")).as("max_shard"))
      .collect()
    // 100k/cap -> 10 sub-strata, each named web#k; the small stratum is
    // left whole under its plain name
    assert(subs.count(_.getString(1).startsWith("web#")) == 10)
    assert(subs.exists(r => r.getString(0) == "books" && r.getString(1) == "books"))
    // within each sub-stratum the running-offset rule holds exactly:
    // last doc starts at (n-1)*3 tokens -> shard floor((n-1)*3 / 3000)
    subs.foreach { r =>
      val (n, maxShard) = (r.getLong(2), r.getLong(3))
      assert(maxShard == (n - 1) * 3 / 3000, s"${r.getString(1)}: n=$n max=$maxShard")
    }
    // sub-assignment is an md5 of the id: deterministic, roughly even
    val webSizes = subs.filter(_.getString(1).startsWith("web#")).map(_.getLong(2))
    assert(webSizes.sum == 100000L && webSizes.min > 8000 && webSizes.max < 12000)
    // without the cap the schema is exactly the old contract
    val plain = CorpusOps.packShards(docs, "id", "text", "stratum", 3000)
    assert(!plain.columns.contains("pack_stratum"))
  }

  test("saltedSum equals the plain aggregate") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .withColumn("net", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val salted = Salting.saltedSum(li, Seq("l_returnflag"), "net", "l_orderkey")
      .select(col("l_returnflag"), round(col("sum_net"), 4).as("s"), col("n_rows"))
    val plain = li.groupBy("l_returnflag")
      .agg(round(sum("net"), 4).as("s"), count(lit(1)).as("n_rows"))
    assert(salted.orderBy("l_returnflag").collect().toSeq ==
      plain.orderBy("l_returnflag").collect().toSeq)
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(multiProbe: Boolean): Double = {
      val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", "q_id", "q_vec",
          10, nTables = 12, planesPerTable = 4, dim = 64, multiProbe = multiProbe)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (brute & lsh).size.toDouble / brute.size
    }
    val single = recallOf(false)
    val multi = recallOf(true)
    assert(multi >= single, s"multi-probe $multi < single $single")
    assert(multi >= 0.8, s"multi-probe recall too low: $multi")
  }

  test("TPC-H date filters reach the parquet scan as pushed predicates") {
    // The queries write `to_date(l_shipdate) >= lit(...)` for readability;
    // Catalyst rewrites that into a plain timestamp comparison, so the range
    // must appear in the scan's PushedFilters — a regression here means every
    // scan reads the full fact table at 100 TB.
    import org.apache.spark.sql.execution.ExplainMode
    def scanOf(name: String, pushed: String): Unit = {
      val df = graft.queries.TpchQueries.all(name)(spark, sf001)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains(pushed), s"$name missing pushed filter $pushed:\n$plan")
      assert(!plan.contains("to_date"),
        s"$name: to_date survived optimization (blocks pushdown):\n$plan")
    }
    scanOf("tpch_q6", "GreaterThanOrEqual(l_shipdate,1996-01-01T00:00)")
    scanOf("tpch_q12", "GreaterThanOrEqual(l_shipdate,1997-01-01T00:00)")
    scanOf("tpch_q12", "LessThan(l_shipdate,1998-01-01T00:00)")
    scanOf("tpch_q14", "GreaterThanOrEqual(l_shipdate,1996-03-01T00:00)")
  }

  test("adapted TPC-H q2/q9/q16/q20: dims broadcast, part filters pushed, no all-pairs") {
    // the partsupp-less adaptations derive supply from lineitem — the plan
    // guard pins that every dim side broadcasts and the selective part
    // predicates reach the scan, so the fact table is the only big relation
    // in motion. q2's final frame hides its first phase behind a
    // localCheckpoint (Scan ExistingRDD), so the guard audits BOTH halves:
    // the exposed pre-checkpoint supply relation and the final frame
    // (whose min-cost join carries NO forced broadcast hint — part-bounded
    // side, AQE decides — so no-cartesian is the meaningful assertion).
    for (name <- Seq("tpch_q9", "tpch_q16", "tpch_q20", "tpch_q2")) {
      val plan = graft.queries.TpchQueries.all(name)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$name went all-pairs:\n$plan")
    }
    import org.apache.spark.sql.execution.ExplainMode
    def pushed(name: String, expect: String): Unit = {
      val plan = graft.queries.TpchQueries.all(name)(spark, sf001)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains(expect), s"$name missing pushed filter $expect:\n$plan")
    }
    pushed("tpch_q9", "StringContains(p_name,gear)")
    pushed("tpch_q20", "StringStartsWith(p_name,small)")
    val q2pre = graft.queries.TpchQueries.q2PrunedSupply(spark, sf001)
    val q2preFmt = q2pre.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val q2preExec = q2pre.queryExecution.executedPlan.toString
    assert(!q2preExec.contains("BroadcastNestedLoopJoin") &&
      !q2preExec.contains("CartesianProduct"), s"q2 pre-checkpoint went all-pairs:\n$q2preExec")
    assert(q2preFmt.contains("LessThanOrEqual(p_size,10)") &&
      q2preFmt.contains("EqualTo(p_type,ECONOMY)"),
      s"q2 part predicates not pushed:\n$q2preFmt")
  }

  test("map-side scorers have SHUFFLE-FREE plans: url canon, LR score, quality, bpe") {
    // these ride the scan at any scale — an Exchange appearing in any of
    // them means a per-row operator silently grew a shuffle
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val merges = Seq(("t", "h"), ("th", "e"))
    val m = QualityClassifier.Model(Seq("punct_ratio"),
      Array(0.05), Array(0.05), Array(-3.0), 0.0)
    val scored = QualityClassifier.score(
      TextAnalysis.quality(docs, "text"), m)
    val canon = UrlOps.canonicalize(
      docs.select(col("doc_id"), concat(lit("http://h.com/"), col("doc_id")).as("url")), "url")
    val bpe = docs.select(
      graft.functions.TextFunctions.bpeTokens(col("text"), merges))
    for ((name, df) <- Seq(("quality+lr", scored), ("url_canon", canon), ("bpe", bpe))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name grew a shuffle:\n$plan")
    }
  }

  test("dedupSubstrings plan: wkey-partitioned window, keyed joins, no all-pairs") {
    // the Stress assertions, in the fast suite so a plan regression trips
    // sbt test, not just the 20x run
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = graft.operators.TextAnalysis.dedupSubstrings(
      docs, "doc_id", "text", windowTokens = 12)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"went all-pairs:\n$plan")
    // 'No Partition Defined' is a log WARNING, never plan text — assert on
    // the rendered Window nodes instead: each must carry the wkey
    // partition spec (an unpartitioned window renders an empty spec)
    val winLines = plan.split("\n").filter(_.contains("Window "))
    assert(winLines.nonEmpty, s"expected a Window node in:\n$plan")
    winLines.foreach(l =>
      assert(l.contains("windowspecdefinition(wkey#"),
        s"window lost its wkey partitioning: $l"))
    // and the operator actually cuts at gate scale (planted near-dups)
    assert(out.where(col("n_tokens_removed") > 0).count() > 0)
  }

  test("AQE splits a skewed join at runtime (the no-manual-salting path)") {
    // One key holds ~100x the rows of any other. With thresholds tuned to
    // this toy size, AQE's OptimizeSkewedJoin must split the hot partition
    // — the runtime answer to skew when salting isn't baked into the
    // query. (q_salted_agg covers the explicit-salting alternative.)
    val prev = Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val skewed = spark.range(0, 60000)
        .select(when($"id" < 50000, 0L).otherwise($"id" % 97).as("k"),
          concat(lit("payload-padding-for-bytes-"), $"id").as("v"))
      val other = spark.range(0, 97).select($"id".as("k"), lit("dim").as("d"))
      val joined = skewed.join(other, "k")
      // collect() executes THIS queryExecution, so its adaptive plan is the
      // final one (a count() would build a separate execution)
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("approximate sketches stay within error bounds of exact") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val approx = li.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("ad"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("am"))
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("ed"),
      expr("percentile(l_extendedprice, 0.5)").as("em"))
    val j = approx.join(exact, "l_returnflag").collect()
    j.foreach { r =>
      val (ad, ed) = (r.getAs[Long]("ad").toDouble, r.getAs[Long]("ed").toDouble)
      assert(math.abs(ad - ed) / ed < 0.1, s"HLL off: $ad vs $ed")
      val (am, em) = (r.getAs[Double]("am"), r.getAs[Double]("em"))
      assert(math.abs(am - em) / em < 0.05, s"quantile off: $am vs $em")
    }
  }
}
