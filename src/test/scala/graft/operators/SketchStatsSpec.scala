package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SketchStats]]: the mergeability contract (union of per-batch
  * sketches == single-pass sketch, EXACTLY — register-wise max is
  * associative/commutative/idempotent), the accuracy contract (3·RSE),
  * and the theta overlap estimator vs exact set arithmetic. */
class SketchStatsSpec extends SparkSpec {
  import spark.implicits._

  /** lgK=12 → RSE ≈ 1.04/√4096 ≈ 1.6%; assert within 3·RSE ≈ 4.9%. */
  private val tol = 3 * 1.04 / math.sqrt(1 << 12)

  test("per-batch sketch union == single-pass sketch, exactly; order-invariant") {
    val root = Files.createTempDirectory("graft-sketch").toString + "/s"
    // 3 "ingest batches" with overlapping key populations per group
    val batches = Seq(0, 1, 2).map { b =>
      spark.range(b * 30000L, b * 30000L + 60000L)
        .select((col("id") % 2).cast("string").as("grp"),
          concat(lit("k"), col("id")).as("k"), lit(1L).as("w"))
    }
    batches.foreach(SketchStats.appendBatch(_, root, Seq("grp"), Seq("k"), Seq("w")))

    val inc = SketchStats.mergedFrom(spark, root, Seq("grp"))
      .orderBy("grp")
      .select("grp", "est_distinct_k").as[(String, Long)].collect().toSeq
    val whole = SketchStats.merged(
        SketchStats.sketchBatch(batches.reduce(_ union _), Seq("grp"), Seq("k"), Seq("w")),
        Seq("grp"))
      .orderBy("grp")
      .select("grp", "est_distinct_k").as[(String, Long)].collect().toSeq
    assert(inc == whole, "incremental merge must equal the single-pass sketch exactly")

    // merge order invariance: reversed batch order, same registers
    val rev = SketchStats.merged(
        batches.reverse.map(SketchStats.sketchBatch(_, Seq("grp"), Seq("k"), Seq("w")))
          .reduce(_ unionByName _), Seq("grp"))
      .orderBy("grp").select("grp", "est_distinct_k").as[(String, Long)].collect().toSeq
    assert(rev == whole)

    // idempotent on the DISTINCT estimate: re-merging a batch's sketch
    // changes nothing (registers max with themselves)...
    val doubled = SketchStats.merged(
        (batches :+ batches.head).map(
          SketchStats.sketchBatch(_, Seq("grp"), Seq("k"), Seq("w")))
          .reduce(_ unionByName _), Seq("grp"))
      .orderBy("grp")
    assert(doubled.select("grp", "est_distinct_k").as[(String, Long)]
      .collect().toSeq == whole)
    // ...while the additive stats double-count — replay dedup is the
    // SINK's job (StreamSink batch-id overwrite), not the sketch's
    val n = SketchStats.mergedFrom(spark, root, Seq("grp"))
      .agg(sum("n_rows")).as[Long].head()
    assert(n == 180000L)
    assert(doubled.agg(sum("n_rows")).as[Long].head() == 240000L)
  }

  test("estimates within 3·RSE of exact distinct counts") {
    // 120k rows, 40k distinct keys, skewed repetition
    val df = spark.range(120000L)
      .select(lit("g").as("grp"), concat(lit("k"), col("id") % 40000).as("k"))
    val est = SketchStats.merged(
        SketchStats.sketchBatch(df, Seq("grp"), Seq("k")), Seq("grp"))
      .select("est_distinct_k").as[Long].head()
    assert(math.abs(est - 40000.0) / 40000.0 <= tol,
      s"estimate $est outside 3-RSE of 40000")
  }

  test("theta overlap estimates |A∩B|, |A∪B|, Jaccard within 3·RSE") {
    val a = spark.range(0L, 30000L).select(concat(lit("x"), col("id")).as("k"))
    val b = spark.range(20000L, 50000L).select(concat(lit("x"), col("id")).as("k"))
    val row = SketchStats.overlap(a, "k", b, "k")
      .select("est_a", "est_b", "est_overlap", "est_union", "jaccard_est")
      .as[(Long, Long, Long, Long, Double)].head()
    def close(est: Long, exact: Double, scale: Double) =
      assert(math.abs(est - exact) / scale <= tol, s"$est vs $exact")
    close(row._1, 30000.0, 30000.0)
    close(row._2, 30000.0, 30000.0)
    // intersection error compounds from both sides — scale by the union
    close(row._3, 10000.0, 50000.0)
    close(row._4, 50000.0, 50000.0)
    assert(math.abs(row._5 - 0.2) <= 2 * tol, s"jaccard ${row._5} vs 0.2")
  }

  test("disjoint sides estimate ~zero overlap") {
    val a = spark.range(0L, 10000L).select(concat(lit("a"), col("id")).as("k"))
    val b = spark.range(0L, 10000L).select(concat(lit("b"), col("id")).as("k"))
    val row = SketchStats.overlap(a, "k", b, "k")
      .select("est_overlap", "jaccard_est").as[(Long, Double)].head()
    assert(row._1 <= (20000 * tol).toLong, s"phantom overlap ${row._1}")
    assert(row._2 <= tol)
  }

  test("KLL quantiles from merged per-batch sketches within rank-error bounds") {
    // uniform 0..99999 across 4 interleaved batches; k=200 → ~1.65% rank
    // error, so on uniform data the value error is ~the same fraction of
    // the range — assert within 5%
    val batches = (0 until 4).map { b =>
      spark.range(100000L).where(col("id") % 4 === b)
        .select(lit("g").as("grp"), col("id").as("v"))
    }
    val rel = batches.map(
        SketchStats.sketchBatch(_, Seq("grp"), Nil, Nil, quantileCols = Seq("v")))
      .reduce(_ unionByName _)
    val row = SketchStats.merged(rel, Seq("grp"))
      .select("p50_v", "p90_v", "p99_v").as[(Double, Double, Double)].head()
    assert(math.abs(row._1 - 50000.0) <= 5000.0, s"p50 ${row._1}")
    assert(math.abs(row._2 - 90000.0) <= 5000.0, s"p90 ${row._2}")
    assert(math.abs(row._3 - 99000.0) <= 5000.0, s"p99 ${row._3}")
    assert(row._1 <= row._2 && row._2 <= row._3)
  }

  test("frequencies: typed keys survive the round-trip — null key, date key, CMS err-high-only") {
    // key columns: a nullable string and a DATE — the two shapes a
    // sampled-JSON schema loses (to_json drops null fields; inferred
    // dates come back strings). The schema must come from the input.
    val rows: Seq[(Option[String], String, String)] = Seq(
      (None, "2024-01-01", "a"), (None, "2024-01-01", "a"),
      (None, "2024-01-01", "b"),
      (Some("en"), "2024-01-01", "a"),
      (Some("en"), "2024-01-02", "b"), (Some("en"), "2024-01-02", "b"))
    val df = rows.toDF("lang", "d", "token")
      .withColumn("day", col("d").cast("date")).drop("d")
    val batches = SketchStats.sketchBatch(df, Seq("lang", "day"),
      distinctCols = Nil, freqCols = Seq("token"))
    val freq = SketchStats.frequencies(batches, Seq("lang", "day"),
      "token", strValues = Seq("a", "b", "zz"))
    assert(freq.schema("lang").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(freq.schema("day").dataType ==
      org.apache.spark.sql.types.DateType, "date key lost its type")
    val got = freq
      .select(col("lang"), col("day").cast("string"), col("value"),
        col("est_count"))
      .as[(Option[String], String, String, Long)].collect()
      .map { case (l, dy, v, c) => (l, dy, v) -> c }.toMap
    // 3 groups × 3 probes; the null-key group keeps its row AND its null
    assert(got.size == 9, s"expected 9 probe rows, got ${got.size}")
    val exact: Map[(Option[String], String, String), Long] = Map(
      (None, "2024-01-01", "a") -> 2L, (None, "2024-01-01", "b") -> 1L,
      (None, "2024-01-01", "zz") -> 0L,
      (Some("en"), "2024-01-01", "a") -> 1L,
      (Some("en"), "2024-01-01", "b") -> 0L,
      (Some("en"), "2024-01-01", "zz") -> 0L,
      (Some("en"), "2024-01-02", "a") -> 0L,
      (Some("en"), "2024-01-02", "b") -> 2L,
      (Some("en"), "2024-01-02", "zz") -> 0L)
    // CMS errs HIGH only, and at n≤3 per group eps·n < 1 ⇒ exact
    exact.foreach { case (k, want) =>
      assert(got(k) == want, s"$k: est ${got(k)} != exact $want")
    }
  }

  test("gate queries emit all-pass contract verdicts at sf0.001") {
    // since R18 the sketch gates emit (contract, ok, detail) verdict
    // rows (ContractGate); the underlying estimates are exercised INSIDE
    // each gate against Spark-exact baselines — so the spec-level
    // assertion is exactly the driver's: every contract holds, and the
    // per-lang contract families actually fired
    for (q <- Seq("corpus_sketch", "corpus_kll", "decon_overlap_est")) {
      val v = graft.queries.ExtraQueries.all(q)(spark, sf001)
        .select("contract", "ok", "detail")
        .as[(String, Boolean, String)].collect()
      assert(v.nonEmpty, s"$q: empty verdict frame")
      val failed = v.filterNot(_._2)
      assert(failed.isEmpty,
        s"$q: failing contracts ${failed.map(f => s"${f._1}(${f._3})").mkString(", ")}")
    }
    val cs = graft.queries.ExtraQueries.corpusSketch(spark, sf001)
      .select("contract").as[String].collect()
    assert(cs.count(_.startsWith("hll_rel_err")) == 5, "one HLL bound per lang")
    val kll = graft.queries.ExtraQueries.corpusKll(spark, sf001)
      .select("contract").as[String].collect()
    assert(kll.count(_.startsWith("kll_rank")) == 15, "three rank tests per lang")
  }
}
