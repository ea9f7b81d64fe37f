package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BatchLog.compact]] corner cases the stream-level specs don't reach:
  * a fold that legitimately produces ZERO rows must retire the folded
  * partitions without a snapshot — and without crashing the stream or
  * stranding rows in `_trash_*` (the pre-fix failure mode: the snapshot
  * rename threw on a dir the empty write never created, AFTER the
  * aside-renames). */
class BatchLogSpec extends SparkSpec {
  import spark.implicits._

  private def land(path: String, id: Long, rows: Seq[(String, Long)]): Unit =
    rows.toDF("k", "n").withColumn("_batch_id", lit(id))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id").parquet(path)

  test("empty fold: folded partitions retire, no snapshot, log stays readable") {
    val path = Files.createTempDirectory("graft-batchlog-empty").toString + "/log"
    (0L to 3L).foreach(id => land(path, id, Seq(("a", id), ("b", id))))
    // a fold eliminating every row (the MG cap-decrement-to-empty shape)
    val folded = BatchLog.compact(spark, path, keepRecent = 2,
      fold = df => df.where(lit(false)))
    assert(folded == Seq(0L, 1L), s"folded $folded")
    // absence IS the snapshot: merging zero rows is neutral downstream
    assert(BatchLog.batchIds(spark, path) == Seq(2L, 3L),
      "empty fold must retire folded ids and land NO -1 snapshot")
    assert(spark.read.parquet(path).count() == 4L)
    // no stranded hidden dirs for the orphan sweep to reap later
    val leftovers = new java.io.File(path).listFiles().map(_.getName)
      .filter(n => n.startsWith("_trash_") || n.startsWith("_staging_"))
    assert(leftovers.isEmpty, s"stranded: ${leftovers.mkString(", ")}")
    // the log keeps working: land more, compact again non-empty
    land(path, 4L, Seq(("c", 9L)))
    val folded2 = BatchLog.compact(spark, path, keepRecent = 2,
      fold = df => df.groupBy("k").agg(sum("n").as("n")))
    assert(folded2 == Seq(2L))
    assert(BatchLog.batchIds(spark, path) == Seq(-1L, 3L, 4L))
    assert(spark.read.parquet(path).where(col("k") === "a")
      .agg(sum("n")).head.getLong(0) == 2L + 3L)
  }

  test("empty fold with a previous snapshot: the snapshot retires too") {
    val path = Files.createTempDirectory("graft-batchlog-snap").toString + "/log"
    (0L to 3L).foreach(id => land(path, id, Seq(("a", id))))
    BatchLog.compact(spark, path, keepRecent = 2,
      fold = df => df.groupBy("k").agg(sum("n").as("n")))
    assert(BatchLog.batchIds(spark, path) == Seq(-1L, 2L, 3L))
    land(path, 4L, Seq(("a", 10L)))
    // this fold covers snapshot + id 2 and returns nothing: both retire
    val folded = BatchLog.compact(spark, path, keepRecent = 2,
      fold = df => df.where(lit(false)))
    assert(folded == Seq(2L))
    assert(BatchLog.batchIds(spark, path) == Seq(3L, 4L))
  }
}
