package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DatamartIncr]]: incremental maintenance must equal the batch rebuild
  * EXACTLY — under adversarial delta splits (an order's lines split across
  * deltas), on real sf0.001 fact data, and through the persisted bucketed
  * state / partitioned summary paths where untouched partitions must stay
  * byte-identical. */
class DatamartIncrSpec extends SparkSpec {
  import spark.implicits._

  private def dimOf(rows: Seq[(Int, Long, String, String)]): DataFrame =
    rows.toDF("customer_sk", "customer_id", "name", "mkt_segment")
      .withColumn("is_current", lit(true))

  private val dim = dimOf(Seq(
    (1, 1L, "alice", "SEG"), (2, 2L, "bob", "SEG"), (3, 3L, "carol", "SEG")))

  // order 101's two lines land in DIFFERENT deltas — the case a
  // per-customer running count(DISTINCT) gets wrong and order-grain
  // state must absorb exactly
  private val factRows = Seq(
    (1, "2024-06-25", 100L, 600.0),
    (1, "2024-06-20", 101L, 400.0),
    (1, "2024-06-20", 101L, 200.0),
    (2, "2023-06-01", 103L, 50.0),
    (3, "2024-06-30", 104L, 700.0))
  private def factOf(rows: Seq[(Int, String, Long, Double)]): DataFrame =
    rows.toDF("customer_sk", "od", "order_id", "net_amount")
      .withColumn("order_date", col("od").cast("date")).drop("od")

  private def analyticsRows(df: DataFrame): Set[(Long, String, String, String,
      String, Long, Double, Int, Double, String)] =
    df.select(col("customer_id"), col("name"), col("mkt_segment"),
        col("first_order_date").cast("string"),
        col("last_order_date").cast("string"),
        col("total_orders"), col("total_lifetime_value"),
        col("days_since_last_order"), col("average_order_value"),
        col("customer_segment"))
      .as[(Long, String, String, String, String, Long, Double, Int, Double,
        String)].collect().toSet

  test("order split across deltas: state merge == batch, distinct orders exact") {
    val fact = factOf(factRows)
    val d1 = factOf(factRows.take(2)) // first line of 101
    val d2 = factOf(factRows.slice(2, 4)) // second line of 101
    val d3 = factOf(factRows.drop(4))
    val state = DatamartIncr.mergeState(
      DatamartIncr.mergeState(DatamartIncr.orderState(d1),
        DatamartIncr.orderState(d2)),
      DatamartIncr.orderState(d3))
    // the split order folded to ONE state row with the summed net
    val o101 = state.where(col("order_id") === 101L).collect()
    assert(o101.length == 1 && o101.head.getAs[Double]("net_amount") == 600.0)
    val anchor = spark.range(1)
      .select(lit("2024-07-01").cast("date").as("anchor_date"))
    val got = analyticsRows(
      DatamartIncr.customerAnalyticsFromState(state, dim, anchor))
    val want = analyticsRows(Datamart.customerAnalytics(fact, dim, "2024-07-01"))
    assert(got == want, s"incremental $got != batch $want")
    // alice: 2 distinct orders (101 counted once despite the split)
    assert(got.exists(r => r._1 == 1L && r._6 == 2L))
  }

  test("sf0.001 fact split by LINE NUMBER (orders shredded across 3 deltas) == batch") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val dimC = Scd2.snapshotDim(
      spark.read.parquet(s"$sf001/customer.parquet")
        .select(col("c_custkey").as("customer_id"), col("c_name").as("name"),
          col("c_mktsegment").as("mkt_segment")),
      "customer_id", "customer_sk")
    val dimP = Scd2.snapshotDim(
      spark.read.parquet(s"$sf001/part.parquet")
        .select(col("p_partkey").as("part_id")), "part_id", "part_sk")
    val fact = FactBuild.factOrders(orders, lineitem, dimC, dimP)
    // split by line number mod 3: nearly every multi-line order is
    // shredded across deltas
    val deltas = (0 to 2).map(i => fact.where(col("line_number") % 3 === i))
    val state = deltas.map(DatamartIncr.orderState)
      .reduce(DatamartIncr.mergeState)
    val anchor = Datamart.anchorOf(orders, "o_orderdate")
    val got = analyticsRows(
      DatamartIncr.customerAnalyticsFromState(state, dimC, anchor))
    val want = analyticsRows(
      Datamart.customerAnalytics(fact, dimC, anchor))
    assert(got == want)
    assert(state.count() == fact.select("order_id").distinct().count(),
      "state is not order-grain")
  }

  test("salesSummaryRefresh: touched-date splice == full rebuild (pure relational)") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val dimC = Scd2.snapshotDim(
      spark.read.parquet(s"$sf001/customer.parquet")
        .select(col("c_custkey").as("customer_id")), "customer_id", "customer_sk")
    val dimP = Scd2.snapshotDim(
      spark.read.parquet(s"$sf001/part.parquet")
        .select(col("p_partkey").as("part_id"),
          col("p_type").as("category")), "part_id", "part_sk")
    val dates = DateDim.fromTableSpan(orders, "o_orderdate")
    val fact = FactBuild.factOrders(orders, lineitem, dimC, dimP)
    val split = "1999-01-01"
    val prev = Datamart.salesSummary(
      fact.where(col("order_date") < lit(split).cast("date")), dimP, dates)
    val touched = DatamartIncr.touchedDates(
      fact.where(col("order_date") >= lit(split).cast("date")))
    assert(touched.nonEmpty && touched.forall(_ >= split))
    val got = DatamartIncr.salesSummaryRefresh(prev, fact, dimP, dates, touched)
    val want = Datamart.salesSummary(fact, dimP, dates)
    def rows(df: DataFrame) = df
      .select(col("date").cast("string"), col("product_category"),
        col("total_sales"), col("total_orders"), col("total_quantity"),
        col("avg_order_value"))
      .as[(String, String, Double, Long, Double, Double)].collect().toSet
    assert(rows(got) == rows(want))
  }

  test("persisted summary refresh: only touched date partitions rewritten, byte-identical rest") {
    val path = Files.createTempDirectory("graft-dmincr-sum").toString + "/sum"
    val fact = factOf(factRows)
    val dimP = Seq((0, "CAT")).toDF("part_sk", "category")
      .withColumn("is_current", lit(true))
    val factP = fact.withColumn("part_sk", lit(0))
      .withColumn("quantity", lit(1.0))
    val dates = DateDim.fromTableSpan(
      factP.select(col("order_date").as("d")), "d")
    DatamartIncr.writeSalesSummary(
      Datamart.salesSummary(factP, dimP, dates), path)
    def partFiles(date: String) = {
      val dir = Paths.get(path, s"date=$date")
      if (!java.nio.file.Files.exists(dir)) Map.empty[String, Long]
      else java.nio.file.Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
        .map(f => f -> java.nio.file.Files.getLastModifiedTime(
          Paths.get(f)).toMillis).toMap
    }
    val before = partFiles("2023-06-01")
    assert(before.nonEmpty)
    // late rows arrive for 2024-06-20 only → refresh that one date
    val late = factOf(Seq((1, "2024-06-20", 105L, 111.0)))
    val newFull = factP.unionByName(
      late.withColumn("part_sk", lit(0)).withColumn("quantity", lit(1.0)))
    DatamartIncr.refreshSalesSummaryAt(path, newFull, dimP, dates,
      DatamartIncr.touchedDates(late))
    assert(partFiles("2023-06-01") == before,
      "untouched date partition was rewritten")
    def rows(df: DataFrame) = df
      .select(col("date").cast("string"), col("product_category"),
        col("total_sales"), col("total_orders"))
      .as[(String, String, Double, Long)].collect().toSet
    assert(rows(DatamartIncr.readSalesSummary(spark, path)) ==
      rows(Datamart.salesSummary(newFull, dimP, dates)))
  }

  test("applyDelta: bucketed persisted state, untouched buckets not rewritten") {
    val path = Files.createTempDirectory("graft-dmincr-state").toString + "/st"
    val nB = 8
    val d1 = factOf(factRows.take(3))
    DatamartIncr.writeState(DatamartIncr.orderState(d1), path, nB)
    def bucketFiles(): Map[String, Long] = {
      val stream = java.nio.file.Files.walk(Paths.get(path))
      try stream.toArray.map(_.toString).filter(_.endsWith(".parquet"))
        .map(f => f -> java.nio.file.Files.getLastModifiedTime(
          Paths.get(f)).toMillis).toMap
      finally stream.close()
    }
    val before = bucketFiles()
    // delta touching ONLY customer 3 → exactly one bucket rewritten
    val touched = DatamartIncr.applyDelta(spark,
      path, factOf(factRows.drop(4)), nB)
    assert(touched.length == 1)
    val after = bucketFiles()
    val keptBefore = before.filterNot(_._1.contains(s"_kb=${touched.head}"))
    assert(keptBefore.forall { case (f, t) => after.get(f).contains(t) },
      "untouched bucket files changed")
    // second delta (bob) then derive == batch over everything
    DatamartIncr.applyDelta(spark, path, factOf(factRows.slice(3, 4)), nB)
    val anchor = spark.range(1)
      .select(lit("2024-07-01").cast("date").as("anchor_date"))
    val got = analyticsRows(DatamartIncr.customerAnalyticsFromState(
      DatamartIncr.readState(spark, path), dim, anchor))
    assert(got == analyticsRows(
      Datamart.customerAnalytics(factOf(factRows), dim, "2024-07-01")))
  }

  test("refresh guards: empty touched dates refused") {
    intercept[IllegalArgumentException] {
      DatamartIncr.salesSummaryRefresh(spark.emptyDataFrame,
        spark.emptyDataFrame, spark.emptyDataFrame, spark.emptyDataFrame, Nil)
    }
  }
}
