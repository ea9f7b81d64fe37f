package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.SketchStats

/** [[SketchStream]]: streamed per-batch sketches must merge to exactly
  * the single-pass batch sketch, and a replayed batch id must leave BOTH
  * the estimates and the additive stats unchanged (exactly-once landing,
  * not just union idempotence). */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed sketches merge to the single-pass result; replay exactly-once") {
    implicit val sq = spark.sqlContext
    val path = Files.createTempDirectory("graft-skstream").toString + "/s"
    val ckpt = Files.createTempDirectory("graft-skstream-ckpt").toString

    val adds: Seq[Seq[(String, String, Long)]] = Seq(
      (0 until 20000).map(i => ("a", s"k${i % 7000}", (i % 10).toLong)),
      (0 until 20000).map(i => ("b", s"k${i % 5000}", (i % 10).toLong)),
      (0 until 20000).map(i => ("a", s"k${i % 9000 + 4000}", (i % 10).toLong)))

    val mem = MemoryStream[(String, String, Long)]
    val stream = mem.toDF().toDF("grp", "k", "w")
    val q = SketchStream.run(stream, path, ckpt,
      Seq("grp"), Seq("k"), Seq("w"), Seq("w"))
    try {
      adds.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // additive stats are exactly-once — compare EXACTLY. Distinct
    // estimates: a directly-built sketch uses the HIP estimator while a
    // union switches to the composite estimator, so streamed-vs-batch
    // builds legitimately differ SUB-RSE — compare within 1% (observed
    // ~0.1%; true counts a=13000, b=5000). KLL quantiles are
    // rank-approximate (randomized compaction): values are 0..9
    // uniform, so p50 lands in [3, 6].
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("grp")
        .selectExpr("grp", "n_rows", "sum_w", "est_distinct_k", "p50_w")
        .as[(String, Long, Long, Long, Double)].collect().toSeq

    val streamed = rows(SketchStream.stats(spark, path, Seq("grp")))
    val single = rows(SketchStats.merged(
      SketchStats.sketchBatch(adds.flatten.toDF("grp", "k", "w"),
        Seq("grp"), Seq("k"), Seq("w"), Seq("w")), Seq("grp")))
    assert(streamed.map(r => (r._1, r._2, r._3)) ==
      single.map(r => (r._1, r._2, r._3)),
      s"streamed $streamed != single-pass $single")
    streamed.zip(single).foreach { case (s, w) =>
      assert(math.abs(s._4 - w._4).toDouble / w._4 <= 0.01,
        s"${s._1}: streamed est ${s._4} vs single-pass ${w._4}")
    }
    streamed.foreach(r => assert(r._5 >= 3.0 && r._5 <= 6.0, s"p50 ${r._5}"))

    // crash-replay of batch id 1 (recomputed OUTSIDE the stream, so the
    // sketch bytes may differ sub-RSE): the landed rows are REPLACED,
    // never appended — additive stats exactly unchanged, estimates
    // within the estimator band
    SketchStream.writeBatch(adds(1).toDF("grp", "k", "w"), 1L, path,
      Seq("grp"), Seq("k"), Seq("w"), Seq("w"))
    val replayed = rows(SketchStream.stats(spark, path, Seq("grp")))
    assert(replayed.map(r => (r._1, r._2, r._3)) ==
      streamed.map(r => (r._1, r._2, r._3)),
      "replayed batch id double-counted additive stats")
    replayed.zip(streamed).foreach { case (r, s) =>
      assert(math.abs(r._4 - s._4).toDouble / s._4 <= 0.01, s"${r._1}: ${r._4} vs ${s._4}")
    }

    // a replay that recomputes the SAME batch frame is bit-identical for
    // the DETERMINISTIC sketches (HLL registers, sums) — KLL is excluded
    // here because datasketches KLL compaction is genuinely randomized
    // (not seeded), so its bytes differ run-to-run; its estimates stay in
    // the rank band asserted above
    val p2 = Files.createTempDirectory("graft-skstream2").toString + "/s"
    val b1 = adds(1).toDF("grp", "k", "w")
    def rowsNoKll(path: String) =
      SketchStream.stats(spark, path, Seq("grp")).orderBy("grp")
        .selectExpr("grp", "n_rows", "sum_w", "est_distinct_k")
        .as[(String, Long, Long, Long)].collect().toSeq
    SketchStream.writeBatch(b1, 0L, p2, Seq("grp"), Seq("k"), Seq("w"))
    val once = rowsNoKll(p2)
    SketchStream.writeBatch(b1, 0L, p2, Seq("grp"), Seq("k"), Seq("w"))
    assert(rowsNoKll(p2) == once, "same-frame replay must be bit-identical")
  }
}
