package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Datamart
import graft.pipeline.StarPipeline

/** [[StarStream]]: the always-on star (CDC→SCD2 dims + fact feed →
  * fact/summary/analytics) must land, table for table, exactly where the
  * batch [[StarPipeline]] lands on the same data — under out-of-order CDC
  * arrival, orders' lines split across micro-batches, state-log
  * compaction mid-stream, and batch-id replay. */
class StarStreamSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------------
  // Fixture: a 6-month trim of sf0.001 (keeps the summary's touched-date
  // partition churn test-sized), batch-built once as the ground truth.
  // -------------------------------------------------------------------

  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("graft-starstream-src").toString
    val full = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$full/orders.parquet")
      .where(to_date(col("o_orderdate"))
        .between(lit("1995-01-01").cast("date"), lit("1995-06-30").cast("date")))
    orders.write.parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$full/lineitem.parquet")
      .join(broadcast(orders.select(col("o_orderkey").as("_ok"))),
        col("l_orderkey") === col("_ok"), "left_semi")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq("customer", "part").foreach { t =>
      spark.read.parquet(s"$full/$t.parquet").write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Batch ground truth: the reference's three DAGs, run once. */
  private lazy val wb: String = {
    val w = Files.createTempDirectory("graft-starstream-wb").toString
    val report = StarPipeline.run(spark, srcDir, w)
    assert(report.succeeded, s"batch pipeline failed: ${report.statuses}")
    w
  }

  private def dimPart = spark.read.parquet(s"$wb/core/dim_parts")
  private def dimDates = spark.read.parquet(s"$wb/core/dim_dates")
  private def anchor = Datamart.anchorOf(
    spark.read.parquet(s"$srcDir/orders.parquet"), "o_orderdate")

  // -------------------------------------------------------------------
  // The two feeds
  // -------------------------------------------------------------------

  /** CDC observations: every customer gets a stale observation at t0 and
    * its final snapshot row at t1 (a tracked-attribute change, so the
    * SCD2 current row IS the final snapshot). Keys split into thirds:
    * A/B old-then-final in order; C's final arrives BEFORE its t0
    * observation — the late pre-history insert only a rebuild handles. */
  private type Cdc = (Long, String, Long, Double, String, Timestamp)
  private lazy val cdcBatches: Seq[Seq[Cdc]] = {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-02-01 00:00:00")
    val snap = spark.read.parquet(s"$srcDir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("c_nationkey").cast("long"), col("c_acctbal").cast("double"),
        col("c_mktsegment"))
      .as[(Long, String, Long, Double, String)].collect().sortBy(_._1).toSeq
    def old(r: (Long, String, Long, Double, String)): Cdc =
      (r._1, r._2, r._3, r._4 - 100.0, "__STALE__", t0)
    def fin(r: (Long, String, Long, Double, String)): Cdc =
      (r._1, r._2, r._3, r._4, r._5, t1)
    val third = (snap.size + 2) / 3
    val Seq(a, b, c) = snap.grouped(third).toSeq: @unchecked
    Seq(a.map(old) ++ b.map(old) ++ a.map(fin),
        b.map(fin) ++ c.map(fin),
        c.map(old))
  }
  private def cdcDf(rows: Seq[Cdc]): DataFrame =
    rows.toDF("customer_id", "name", "nation_key", "acct_bal",
      "mkt_segment", "ts")

  /** Fact feed: the batch pipeline's own fact rows, chunked so an
    * order's lines SPLIT across micro-batches (the order-state merge
    * case) and every chunk touches most dates (the summary's
    * late-arrival recompute case). */
  private type Fact = (Long, String, String, String, Long, Double, Double,
    Double, Double, String)
  private lazy val factChunks: Seq[Seq[Fact]] = {
    val rows = spark.read.parquet(s"$wb/core/fact_orders")
      .select(col("order_id").cast("long"),
        col("order_date").cast("string"), col("customer_sk"),
        col("part_sk"), col("line_number").cast("long"), col("quantity").cast("double"),
        col("extended_price").cast("double"), col("discount").cast("double"),
        col("net_amount").cast("double"), col("status"))
      .as[Fact].collect().toSeq
    assert(rows.size > 100, s"fixture too small: ${rows.size} fact rows")
    (0 until 3).map(i => rows.filter(r => (r._1 + r._5) % 3 == i))
  }
  private def factDf(rows: Seq[Fact]): DataFrame =
    rows.toDF("order_id", "od", "customer_sk", "part_sk", "line_number",
        "quantity", "extended_price", "discount", "net_amount", "status")
      .withColumn("order_date", col("od").cast("date")).drop("od")

  // -------------------------------------------------------------------
  // Table-for-table comparisons (typed collects; dates as strings)
  // -------------------------------------------------------------------

  private def dimRows(df: DataFrame) = df
    .select(col("customer_id").cast("long"), col("name"),
      col("nation_key").cast("long"), col("acct_bal").cast("double"),
      col("mkt_segment"), col("customer_sk"))
    .as[(Long, String, Long, Double, String, String)].collect().toSet

  private def factRows(df: DataFrame) = df
    .select(col("order_id").cast("long"), col("order_date").cast("string"),
      col("customer_sk"), col("part_sk"), col("line_number").cast("long"),
      col("quantity").cast("double"), col("extended_price").cast("double"),
      col("discount").cast("double"), col("net_amount").cast("double"),
      col("status"))
    .as[Fact].collect().toSet

  private def sumRows(df: DataFrame) = df
    .select(col("date").cast("string"), col("product_category"),
      col("total_sales"), col("total_orders"), col("total_quantity"),
      col("avg_order_value"))
    .as[(String, String, Double, Long, Double, Double)].collect().toSet

  private def anaRows(df: DataFrame) = df
    .select(col("customer_id").cast("long"), col("name"), col("mkt_segment"),
      col("first_order_date").cast("string"),
      col("last_order_date").cast("string"),
      col("total_orders").cast("long"), col("total_lifetime_value"),
      col("days_since_last_order").cast("long"),
      col("average_order_value"), col("customer_segment"))
    .as[(Long, String, String, String, String, Long, Double, Long, Double,
      String)].collect().toSet

  /** End state == batch StarPipeline, all four maintained tables. */
  private def assertMatchesBatch(layout: StarStream.Layout,
                                 cfg: StarStream.Config): Unit = {
    assert(dimRows(StarStream.dimCustomersCurrent(spark, layout, cfg)) ==
      dimRows(spark.read.parquet(s"$wb/core/dim_customers")
        .where(col("is_current"))),
      "dim_customers (current) diverged from the batch snapshot dim")
    assert(factRows(StarStream.factOrders(spark, layout)) ==
      factRows(spark.read.parquet(s"$wb/core/fact_orders")),
      "fact_orders diverged from the batch fact")
    assert(sumRows(StarStream.salesSummary(spark, layout)) ==
      sumRows(spark.read.parquet(s"$wb/datamart/sales_summary")),
      "sales_summary diverged from the batch datamart")
    assert(anaRows(StarStream.customerAnalytics(spark, layout, anchor, cfg)) ==
      anaRows(spark.read.parquet(s"$wb/datamart/customer_analytics")),
      "customer_analytics diverged from the batch datamart")
  }

  private def cfg = StarStream.Config(nBuckets = 8,
    stateCompactEvery = 2, stateKeepRecent = 1)

  test("direct apply: end state == batch StarPipeline table-for-table; replay convergent") {
    val layout = StarStream.Layout(
      Files.createTempDirectory("graft-starstream-wh").toString)
    cdcBatches.zipWithIndex.foreach { case (b, i) =>
      StarStream.applyCdcBatch(cdcDf(b), i.toLong, layout, cfg)
    }
    factChunks.zipWithIndex.foreach { case (ch, i) =>
      StarStream.applyFactBatch(factDf(ch), i.toLong, layout,
        dimPart, dimDates, cfg)
    }
    // fact batch 2 tripped the every-2 state fold: ids 0,1 are compacted
    assert(BatchLog.batchIds(spark, layout.customerState) == Seq(-1L, 2L),
      "state log did not compact mid-stream")
    assertMatchesBatch(layout, cfg)

    // crash-replay the newest (un-folded) fact batch and a CDC batch:
    // every landing replaces its own slice, every table is a function of
    // its log — nothing moves
    StarStream.applyFactBatch(factDf(factChunks(2)), 2L, layout,
      dimPart, dimDates, cfg)
    StarStream.applyCdcBatch(cdcDf(cdcBatches(1)), 1L, layout, cfg)
    assertMatchesBatch(layout, cfg)
  }

  /** Executed-plan file count of the (single) file scan — AQE-aware
    * (query stages hide their plans in fields, not children). */
  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.size == 1, s"expected one file scan, got ${found.size}")
    found.head.metrics("numFiles").value
  }

  test("the star eats its own index: date-filtered fact and summary reads prune files through the maintained stats index") {
    val layout = StarStream.Layout(
      Files.createTempDirectory("graft-starstream-idx").toString)
    factChunks.zipWithIndex.foreach { case (ch, i) =>
      StarStream.applyFactBatch(factDf(ch), i.toLong, layout,
        dimPart, dimDates, cfg)
    }
    assert(graft.sources.StatsIndex.generations(spark, layout.factGens).nonEmpty &&
      graft.sources.StatsIndex.generations(spark, layout.summaryGens).nonEmpty,
      "applyFactBatch must commit versioned manifests for both tables")

    val d = factChunks.head.head._2 // one date present in the log
    val total = spark.read.parquet(layout.factOrders).inputFiles.length
    val q = StarStream.factOrders(spark, layout)
      .where(col("order_date") === lit(d).cast("date"))
    val n = scanFiles(q)
    // one date's dirs only (a landing may write several files per dir)
    assert(n * 10 <= total,
      s"date-filtered fact read scanned $n of $total files — index not consulted")
    val want = factRows(spark.read.parquet(layout.factOrders)
      .drop("_batch_id")
      .withColumn("order_date", col("order_date").cast("date"))
      .where(col("order_date") === lit(d).cast("date")))
    assert(want.nonEmpty && factRows(q) == want,
      "indexed fact read changed the answer")

    val sTotal = spark.read.parquet(layout.salesSummary).inputFiles.length
    val s = StarStream.salesSummary(spark, layout)
      .where(col("date") === lit(d).cast("date"))
    val sn = scanFiles(s)
    assert(sn < sTotal && s.count() > 0,
      s"date-filtered summary read scanned $sn of $sTotal files")
  }

  test("end-to-end MemoryStream run: one app, two feeds; any-instant reads; final state == batch") {
    implicit val sq = spark.sqlContext
    val layout = StarStream.Layout(
      Files.createTempDirectory("graft-starstream-wh2").toString)
    val ckpt = Files.createTempDirectory("graft-starstream-ckpt").toString
    val memCdc = MemoryStream[Cdc]
    val memFact = MemoryStream[Fact]
    val q = StarStream.run(
      memCdc.toDF().toDF("customer_id", "name", "nation_key", "acct_bal",
        "mkt_segment", "ts"),
      memFact.toDF().toDF("order_id", "od", "customer_sk", "part_sk",
          "line_number", "quantity", "extended_price", "discount",
          "net_amount", "status")
        .withColumn("order_date", col("od").cast("date")).drop("od"),
      layout, ckpt, () => dimPart, () => dimDates, cfg)
    try {
      memCdc.addData(cdcBatches(0): _*)
      memFact.addData(factChunks(0): _*)
      q.processAllAvailable()
      // any-instant read: the summary mid-stream equals the batch
      // datamart over exactly what has streamed through so far
      assert(sumRows(StarStream.salesSummary(spark, layout)) ==
        sumRows(Datamart.salesSummary(factDf(factChunks(0)), dimPart, dimDates)),
        "mid-stream summary read is not the summary of the streamed prefix")
      assert(StarStream.dimCustomersCurrent(spark, layout, cfg).count() > 0)
      memCdc.addData(cdcBatches(1): _*)
      memFact.addData(factChunks(1): _*)
      q.processAllAvailable()
      memCdc.addData(cdcBatches(2): _*)
      memFact.addData(factChunks(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assertMatchesBatch(layout, cfg)
  }

  test("snapshot isolation: a pinned reader reads consistently THROUGH a concurrent day-republish; retire reaps replaced files") {
    val layout = StarStream.Layout(
      Files.createTempDirectory("graft-starstream-snap").toString)
    StarStream.applyFactBatch(factDf(factChunks(0)), 0L, layout,
      dimPart, dimDates, cfg)
    // pin readers NOW (GraftFileIndex collects its manifest at construction)
    val pinnedFact = StarStream.factOrders(spark, layout)
    val pinnedSum = StarStream.salesSummary(spark, layout)
    val factBefore = factRows(pinnedFact)
    val sumBefore = sumRows(pinnedSum)

    // concurrent republish of the SAME slice with modified content (the
    // re-run-with-changed-upstream shape): the landing replaces the
    // batch's (date, batch) partitions and refreshes its dates' summary
    val doubled = factDf(factChunks(0))
      .withColumn("net_amount", col("net_amount") * 2)
    StarStream.applyFactBatch(doubled, 0L, layout, dimPart, dimDates, cfg)

    // the pinned readers see their OLD generation, bit-identical
    assert(factRows(pinnedFact) == factBefore,
      "pinned fact reader disturbed by a concurrent day-republish")
    assert(sumRows(pinnedSum) == sumBefore,
      "pinned summary reader disturbed by a concurrent day-republish")
    // a reader arriving after the commit sees exactly the new state
    val factAfter = factRows(StarStream.factOrders(spark, layout))
    assert(factAfter == factRows(doubled) && factAfter != factBefore)
    assert(sumRows(StarStream.salesSummary(spark, layout)) ==
      sumRows(Datamart.salesSummary(doubled, dimPart, dimDates)))

    // retention: retire reaps the replaced generation's files; the
    // retained snapshot keeps answering
    StarStream.retire(spark, layout, keep = 1)
    assert(factRows(StarStream.factOrders(spark, layout)) == factAfter)
    assert(graft.sources.StatsIndex.generations(spark, layout.factGens).size == 1)
  }

  test("scheduled retention: retireEvery bounds the generation count inside the fact loop; a reader pinned within keep is never broken") {
    val layout = StarStream.Layout(
      Files.createTempDirectory("graft-starstream-ret").toString)
    val retCfg = cfg.copy(retireEvery = 2, retireKeep = 2)
    // batches 0 and 1 land (generations accumulate)...
    StarStream.applyFactBatch(factDf(factChunks(0)), 0L, layout,
      dimPart, dimDates, retCfg)
    StarStream.applyFactBatch(factDf(factChunks(1)), 1L, layout,
      dimPart, dimDates, retCfg)
    // ...pin a reader on the CURRENT (newest) generation — within keep,
    // so the scheduled retire fired by batch 2 must never break it
    val pinned = StarStream.factOrders(spark, layout)
    val pinnedBefore = factRows(pinned)
    StarStream.applyFactBatch(factDf(factChunks(2)), 2L, layout,
      dimPart, dimDates, retCfg)
    // batch 2 (id % retireEvery == 0) ran retire: generation count is
    // bounded at retireKeep + the one the batch itself just committed
    val factGens = graft.sources.StatsIndex.generations(spark, layout.factGens)
    assert(factGens.size <= retCfg.retireKeep + 1,
      s"scheduled retire did not bound the fact manifest: $factGens")
    assert(graft.sources.StatsIndex
      .generations(spark, layout.summaryGens).size <= retCfg.retireKeep + 1)
    // the pinned reader (newest-at-pin ⇒ within keep) still answers
    // its exact snapshot, and the live read reflects all three batches
    // (only the fact feed ran here, so compare fact + summary directly)
    assert(factRows(pinned) == pinnedBefore,
      "a reader pinned within retireKeep was broken by scheduled retention")
    assert(factRows(StarStream.factOrders(spark, layout)) ==
      factRows(spark.read.parquet(s"$wb/core/fact_orders")),
      "fact_orders diverged from the batch fact after scheduled retention")
    assert(sumRows(StarStream.salesSummary(spark, layout)) ==
      sumRows(spark.read.parquet(s"$wb/datamart/sales_summary")),
      "sales_summary diverged from the batch datamart after scheduled retention")
  }
}
