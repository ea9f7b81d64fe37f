package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Datamart

/** [[DatamartStream]]: landed per-batch order-grain states merged at query
  * time must equal the batch `customer_analytics` over everything streamed,
  * and a replayed batch id must replace its partition, not double-count. */
class DatamartStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq((1, 1L, "alice", "SEG"), (2, 2L, "bob", "SEG"))
    .toDF("customer_sk", "customer_id", "name", "mkt_segment")
    .withColumn("is_current", lit(true))

  // order 11's lines split ACROSS batches 0 and 1 — the replay-safe form
  // must still count it once
  private val batches: Seq[Seq[(Int, String, Long, Double)]] = Seq(
    Seq((1, "2024-06-20", 11L, 400.0), (2, "2023-06-01", 12L, 50.0)),
    Seq((1, "2024-06-20", 11L, 200.0), (1, "2024-06-25", 13L, 600.0)),
    Seq((1, "2024-06-10", 14L, 600.0)))
  private def df(rows: Seq[(Int, String, Long, Double)]) =
    rows.toDF("customer_sk", "od", "order_id", "net_amount")
      .withColumn("order_date", col("od").cast("date")).drop("od")

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.select(col("customer_id"), col("total_orders"),
        col("total_lifetime_value"), col("customer_segment"))
      .as[(Long, Long, Double, String)].collect().toSet

  test("streamed landings == batch analytics; split order counted once; replay exact") {
    val path = Files.createTempDirectory("graft-dmstream").toString + "/s"
    batches.zipWithIndex.foreach { case (b, id) =>
      DatamartStream.writeBatch(df(b), id.toLong, path)
    }
    val union = df(batches.flatten)
    val anchor = spark.range(1)
      .select(lit("2024-07-01").cast("date").as("anchor_date"))
    val want = rows(Datamart.customerAnalytics(union, dim, "2024-07-01"))
    val got = rows(DatamartStream.currentAnalytics(spark, path, dim, anchor))
    assert(got == want, s"streamed $got != batch $want")
    // alice's split order 11 counted once: 3 distinct orders
    assert(got.exists(r => r._1 == 1L && r._2 == 3L))
    // crash-replay of batch 1: partition replaced, answer unchanged
    DatamartStream.writeBatch(df(batches(1)), 1L, path)
    assert(rows(DatamartStream.currentAnalytics(spark, path, dim, anchor))
      == want, "replayed batch id changed the answer")
    assert(spark.read.parquet(path)
        .where(col("_batch_id").cast("long") === 1L).count() == 2,
      "replay appended instead of replacing")
  }

  test("empty first batch is a no-op; compaction folds old partitions, answers unchanged") {
    val path = Files.createTempDirectory("graft-dmstream-cpt").toString + "/s"
    // an empty FIRST batch must not create a bare directory that breaks
    // mergedState's schema inference later
    DatamartStream.writeBatch(df(Seq.empty), 0L, path)
    assert(!new java.io.File(path).exists(), "empty batch created the path")
    batches.zipWithIndex.foreach { case (b, id) =>
      DatamartStream.writeBatch(df(b), id.toLong + 1, path)
    }
    val anchor = spark.range(1)
      .select(lit("2024-07-01").cast("date").as("anchor_date"))
    val want = rows(
      Datamart.customerAnalytics(df(batches.flatten), dim, "2024-07-01"))
    // fold ids 1,2 into the snapshot; keep 3 raw and replayable
    assert(DatamartStream.compact(spark, path, keepRecent = 1) == Seq(1L, 2L))
    assert(BatchLog.batchIds(spark, path) == Seq(-1L, 3L),
      "partition-count not bounded")
    assert(rows(DatamartStream.currentAnalytics(spark, path, dim, anchor))
      == want, "compaction changed the answer")
    // a replay of the KEPT id still replaces its own partition, exactly
    DatamartStream.writeBatch(df(batches(2)), 3L, path)
    assert(rows(DatamartStream.currentAnalytics(spark, path, dim, anchor))
      == want, "post-compaction replay changed the answer")
    // nothing old enough left: compact is a no-op, snapshot absorbed
    assert(DatamartStream.compact(spark, path, keepRecent = 1).isEmpty)
    assert(BatchLog.batchIds(spark, path) == Seq(-1L, 3L))
  }

  test("end-to-end MemoryStream run") {
    implicit val sq = spark.sqlContext
    val path = Files.createTempDirectory("graft-dmstream-e2e").toString + "/s"
    val ckpt = Files.createTempDirectory("graft-dmstream-ckpt").toString
    val mem = MemoryStream[(Int, String, Long, Double)]
    val q = DatamartStream.run(
      mem.toDF().toDF("customer_sk", "od", "order_id", "net_amount")
        .withColumn("order_date", col("od").cast("date")).drop("od"),
      path, ckpt)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val anchor = spark.range(1)
      .select(lit("2024-07-01").cast("date").as("anchor_date"))
    val got = rows(DatamartStream.currentAnalytics(spark, path, dim, anchor))
    val want = rows(
      Datamart.customerAnalytics(df(batches.flatten), dim, "2024-07-01"))
    assert(got == want)
  }
}
