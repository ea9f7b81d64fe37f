package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("PointInTime.pitJoin attaches the valid version, boundary inclusive/exclusive") {
    val dim = Seq(
      (1L, "v1", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      (1L, "v2", "2024-01-10 00:00:00", null.asInstanceOf[String])
    ).toDF("k", "ver", "eff_s", "exp_s")
      .select(col("k"), col("ver"),
        col("eff_s").cast("timestamp").as("effective_ts"),
        col("exp_s").cast("timestamp").as("expiration_ts"))
    val facts = Seq(
      (100L, 1L, "2024-01-05 00:00:00"), // inside v1
      (101L, 1L, "2024-01-10 00:00:00"), // exactly at boundary → v2
      (102L, 1L, "2023-12-31 00:00:00")  // before any version → dropped
    ).toDF("fid", "fk", "fts_s")
      .withColumn("fts", col("fts_s").cast("timestamp")).drop("fts_s")

    val out = PointInTime.pitJoin(facts, dim, "fk", "k", "fts")
      .select("fid", "ver").as[(Long, String)].collect().toMap
    assert(out == Map(100L -> "v1", 101L -> "v2"))

    val outer = PointInTime.pitJoin(facts, dim, "fk", "k", "fts", joinType = "left_outer")
    assert(outer.count() == 3)
    assert(outer.where($"fid" === 102 && $"ver".isNull).count() == 1)
  }

  test("DateDim attributes: holidays, weekend, fiscal year") {
    val driving = Seq("2023-12-30", "2024-01-02").toDF("d")
      .withColumn("d", col("d").cast("date"))
    val dim = DateDim.fromTableSpan(driving, "d").orderBy("full_date")
    assert(dim.count() == 4)
    val newYear = dim.where($"full_date" === "2024-01-01").collect()(0)
    assert(newYear.getAs[String]("holiday_name") == "New Year's Day")
    assert(newYear.getAs[Boolean]("is_holiday"))
    assert(newYear.getAs[Int]("fiscal_year") == 2023) // before July → FY-1
    val sat = dim.where($"full_date" === "2023-12-30").collect()(0)
    assert(sat.getAs[Boolean]("is_weekend") && sat.getAs[String]("day_name") == "Saturday")
  }

  test("Upsert.merge: latest wins, keys preserved") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "b2", 99.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val out = Upsert.merge(base, updates, Seq("k")).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0)))
  }

  test("Datamart.customerAnalytics RFM segments") {
    val fact = Seq(
      // recent + frequent + high value → VIP
      (1, "2024-06-25", 100L, 600.0), (1, "2024-06-20", 101L, 600.0), (1, "2024-06-10", 102L, 600.0),
      // old single order → Inactive (366+ days before anchor)
      (2, "2023-06-01", 103L, 50.0)
    ).toDF("customer_sk", "od", "order_id", "net_amount")
      .withColumn("order_date", col("od").cast("date")).drop("od")
    val dim = Seq((1, 1L, "alice", "SEG"), (2, 2L, "bob", "SEG"))
      .toDF("customer_sk", "customer_id", "name", "mkt_segment")
      .withColumn("is_current", lit(true))
    val out = Datamart.customerAnalytics(fact, dim, "2024-07-01")
      .select("customer_id", "customer_segment").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "VIP", 2L -> "Inactive"))
  }

  test("FactBuild joins resolve surrogate keys (sf0.001)") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val dimC = Scd2.snapshotDim(
      orders.sparkSession.read.parquet(s"$sf001/customer.parquet")
        .select(col("c_custkey").as("customer_id")), "customer_id", "customer_sk")
    val dimP = Scd2.snapshotDim(
      orders.sparkSession.read.parquet(s"$sf001/part.parquet")
        .select(col("p_partkey").as("part_id")), "part_id", "part_sk")
    val fact = FactBuild.factOrders(orders, lineitem, dimC, dimP)
    assert(fact.count() == lineitem.count()) // every line matched both dims
    assert(fact.where(col("customer_sk").isNull || col("part_sk").isNull).count() == 0)
  }
}
