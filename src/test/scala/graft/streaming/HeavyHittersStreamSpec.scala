package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.HeavyHitters

/** [[HeavyHittersStream]]: the merged per-batch MG screen + one exact
  * verify must equal batch [[HeavyHitters.frequent]] on the same frame
  * EXACTLY, the landed candidate relation must stay cap-bounded, and a
  * replayed batch id must leave the answer unchanged. */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  // s = 0.05 -> cap = 20 counters. The feed is adversarial for a merge:
  // the heavy keys' mass is SPREAD EVENLY across batches (no single
  // batch makes them locally dominant) while a churn of singletons
  // pressures the cap in every batch — the case where a broken merge
  // (e.g. per-batch top-k instead of MG) silently loses a true heavy.
  private val Support = 0.05
  private def batchRows(b: Int): Seq[String] =
    (0 until 60).map(i => s"heavy${i % 3}") ++ // 3 keys, 20 each, every batch
      (0 until 8).map(i => "warm") ++ // cumulative 8/batch: heavy overall
      (0 until 132).map(i => s"one-$b-$i") // 132 distinct singletons/batch

  test("streamed screen + exact verify == batch frequent; cap-bounded; replay exact") {
    val path = Files.createTempDirectory("graft-hhstream").toString + "/s"
    val batches = (0 until 5).map(batchRows)
    batches.zipWithIndex.foreach { case (rows, id) =>
      HeavyHittersStream.writeBatch(rows.toDF("token"), id.toLong,
        path, "token", Support)
    }
    val union = batches.flatten.toDF("token")

    // the landed relation is KB-scale: <= cap rows per batch
    val cap = HeavyHitters.capFor(Support)
    val perBatch = spark.read.parquet(path)
      .groupBy(col("_batch_id").cast("long")).count()
      .as[(Long, Long)].collect().toMap
    assert(perBatch.keySet == (0L until 5L).toSet)
    assert(perBatch.values.forall(_ <= cap),
      s"per-batch summary exceeds cap=$cap: $perBatch")

    // merged screen is cap-bounded and covers every true heavy key
    val cands = HeavyHittersStream.mergedCandidates(spark, path,
      "token", Support).as[String].collect().toSet
    assert(cands.size <= cap, s"merged candidates ${cands.size} > cap $cap")
    val want = HeavyHitters.frequent(union, "token", Support)
      .as[(String, Long)].collect().toSet
    assert(want.map(_._1).subsetOf(cands),
      s"screen lost true heavies: ${want.map(_._1) -- cands}")
    // 'warm' is heavy only cumulatively (8 of 200 per batch = 4% < s,
    // 40 of 1000 = 4%... make sure the fixture actually exercises the
    // cross-batch accumulation: heavy0-2 are 10% each)
    assert(want.map(_._1) == Set("heavy0", "heavy1", "heavy2"),
      s"fixture drifted: $want")

    // streamed answer == batch answer, counts exact
    val got = HeavyHittersStream.frequent(union, "token", Support, path)
      .as[(String, Long)].collect().toSet
    assert(got == want, s"streamed $got != batch $want")

    // crash-replay of batch 2: the summary partition is REPLACED, never
    // appended — screen and answer unchanged
    HeavyHittersStream.writeBatch(batches(2).toDF("token"), 2L,
      path, "token", Support)
    val afterReplay = HeavyHittersStream.frequent(union, "token", Support, path)
      .as[(String, Long)].collect().toSet
    assert(afterReplay == want, "replayed batch id changed the answer")
    assert(spark.read.parquet(path)
        .where(col("_batch_id").cast("long") === 2L).count() <= cap,
      "replay appended instead of replacing")
  }

  test("empty first batch is a no-op; compaction keeps the screen a superset and frequent exact") {
    val path = Files.createTempDirectory("graft-hhstream-cpt").toString + "/s"
    HeavyHittersStream.writeBatch(Seq.empty[String].toDF("token"), 0L,
      path, "token", Support)
    assert(!new java.io.File(path).exists(), "empty batch created the path")
    val batches = (0 until 6).map(batchRows)
    batches.zipWithIndex.foreach { case (rows, id) =>
      HeavyHittersStream.writeBatch(rows.toDF("token"), id.toLong,
        path, "token", Support)
    }
    val union = batches.flatten.toDF("token")
    val want = HeavyHitters.frequent(union, "token", Support)
      .as[(String, Long)].collect().toSet
    // fold ids 0..3; MG merges COMPOSE, so the folded snapshot merged
    // with the kept raw summaries is still a valid whole-stream screen
    assert(HeavyHittersStream.compact(spark, path, "token", Support,
      keepRecent = 2) == (0L to 3L))
    assert(BatchLog.batchIds(spark, path) == Seq(-1L, 4L, 5L))
    val cap = HeavyHitters.capFor(Support)
    assert(spark.read.parquet(path)
        .where(col("_batch_id").cast("long") === -1L).count() <= cap,
      "snapshot not cap-bounded")
    val cands = HeavyHittersStream.mergedCandidates(spark, path,
      "token", Support).as[String].collect().toSet
    assert(want.map(_._1).subsetOf(cands),
      s"compaction lost true heavies from the screen: ${want.map(_._1) -- cands}")
    val got = HeavyHittersStream.frequent(union, "token", Support, path)
      .as[(String, Long)].collect().toSet
    assert(got == want, s"post-compaction $got != batch $want")
  }

  test("end-to-end MemoryStream run; a cumulative-only heavy key needs the merge to surface") {
    implicit val sq = spark.sqlContext
    val path = Files.createTempDirectory("graft-hhstream-e2e").toString + "/s"
    val ckpt = Files.createTempDirectory("graft-hhstream-ckpt").toString
    // 'slow' is 6% of every batch but never a batch's top story; across
    // batches it accumulates in the merged summary (counts sum per key)
    val batches: Seq[Seq[String]] = (0 until 4).map { b =>
      (0 until 12).map(_ => "slow") ++
        (0 until 100).map(i => s"big$b-${i % 2}") ++
        (0 until 88).map(i => s"x-$b-$i")
    }
    val mem = MemoryStream[String]
    val q = HeavyHittersStream.run(mem.toDF().toDF("token"), path, ckpt,
      "token", support = 0.05)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val union = batches.flatten.toDF("token")
    val got = HeavyHittersStream.frequent(union, "token", 0.05, path)
      .as[(String, Long)].collect().toSet
    val want = HeavyHitters.frequent(union, "token", 0.05)
      .as[(String, Long)].collect().toSet
    assert(got == want, s"streamed $got != batch $want")
    assert(want.exists(_._1 == "slow"),
      s"fixture drifted: 'slow' (6% overall) should be frequent, got $want")
  }
}
