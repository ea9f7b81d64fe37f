package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization ([[Pq]]): encode determinism, the ADC =
  * exact-distance-to-reconstruction identity (the mathematical definition
  * of asymmetric distance — if this holds, the kernel is correct and only
  * codebook quality affects results), compression shape, and recall vs the
  * brute-force oracle on the real embeddings (gate config m=16/ksub=64,
  * shortlist 5k).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private lazy val cb = Pq.fit(emb, "embedding", m = 16, ksub = 64, seed = 42L)

  private def queriesDf =
    emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("codebooks shape: m subspaces over the 64-dim embeddings") {
    assert(cb.m == 16 && cb.dsub == 4 && cb.dim == 64)
    (0 until cb.m).foreach(j => assert(cb.ksub(j) >= 2 && cb.ksub(j) <= 64))
  }

  test("encode is deterministic and codes are in range") {
    val a = Pq.encode(emb, "vec_id", "embedding", cb)
      .orderBy("vec_id").as[(Long, Seq[Short])].collect().toSeq
    val b = Pq.encode(emb, "vec_id", "embedding", cb)
      .orderBy("vec_id").as[(Long, Seq[Short])].collect().toSeq
    assert(a == b, "same codebooks + same vectors must encode identically")
    assert(a.forall(_._2.length == cb.m))
    a.foreach { case (_, code) =>
      code.zipWithIndex.foreach { case (c, j) =>
        assert(c >= 0 && c < cb.ksub(j), s"code $c out of range in subspace $j")
      }
    }
  }

  test("identical vectors get identical codes") {
    val v = Array.tabulate(64)(i => (i % 7).toFloat - 3f)
    val df = Seq((1L, v), (2L, v.clone())).toDF("vec_id", "embedding")
    val codes = Pq.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Short])].collect().toMap
    assert(codes(1L) == codes(2L))
  }

  test("ADC equals the exact squared distance to the code's reconstruction") {
    // the defining identity of asymmetric distance: adc(code(x), q) ==
    // ||q - decode(code(x))||^2, exactly (same float->double arithmetic)
    val q = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = Pq.adcTopK(Pq.encode(emb, "vec_id", "embedding", cb), cb,
        "vec_id", q, "q_id", "q_vec", k = 5)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
      .as[(Long, Seq[Short])].collect().toMap
    // unit-normalized query vectors, same convention as the operator
    val qn = emb.where(col("vec_id") < 4)
      .select(col("vec_id"),
        graft.functions.VectorOps.unitNorm(
          graft.functions.VectorOps.asDouble(col("embedding"))).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    out.collect().foreach { r =>
      val qid = r.getLong(0); val vid = r.getLong(1); val adc = r.getDouble(2)
      val rec = Pq.decode(codes(vid), cb)
      val exact = qn(qid).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - BigDecimal(exact).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"ADC($qid,$vid)=$adc != round(||q-decode||^2)=$exact")
    }
  }

  test("recall vs brute force: pure ADC and the re-ranked gate path") {
    val q = queriesDf
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val adc = Pq.adcTopK(codes, cb, "vec_id", q, "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val adcRecall = (brute & adc).size.toDouble / brute.size
    assert(adcRecall >= 0.5, s"pure-ADC recall degraded: $adcRecall (measured 0.60)")
    val rr = Pq.topKRerank(codes, cb, "vec_id", emb, "embedding",
        q, "q_id", "q_vec", k = 10, shortlistFactor = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val rrRecall = (brute & rr).size.toDouble / brute.size
    assert(rrRecall >= 0.8, s"re-ranked recall degraded: $rrRecall (measured 0.975)")
  }

  test("re-ranked similarities are EXACT: every returned pair matches brute force") {
    val q = queriesDf
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        "q_id", "q_vec", 50)
      .select("q_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    Pq.topKRerank(codes, cb, "vec_id", emb, "embedding",
        q, "q_id", "q_vec", k = 10, shortlistFactor = 5)
      .select("q_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect()
      .foreach { case (qid, vid, cs) =>
        // any pair the re-rank surfaces that brute force also ranked must
        // carry the identical exact similarity (re-rank never quantizes)
        brute.get((qid, vid)).foreach(exp =>
          assert(cs == exp, s"($qid,$vid): rerank cos=$cs != exact $exp"))
      }
  }

  test("gate probe path (cached index) == cold fit path") {
    import graft.queries.SimilarityQueries
    val cold = SimilarityQueries.annPq(spark, sf001).collect().toSeq
    val probe = SimilarityQueries.annPqProbe(spark, sf001).collect().toSeq
    assert(cold == probe, "cached-index probe diverged from the cold path")
  }

  test("PqEncode and PqAdc stay inside whole-stage codegen") {
    // both kernels sit in per-row hot paths; falling back to interpreted
    // eval would tax every corpus row. A '*' prefix on the Project node
    // in the simple plan marks whole-stage codegen.
    val enc = Pq.encode(emb, "vec_id", "embedding", cb)
    val encPlan = enc.queryExecution.executedPlan.toString
    // the encode projection must sit inside a codegen span ("*(n)" marks
    // one) — whether it plans fresh or resolves through a cached
    // InMemoryRelation whose inner plan carries the span
    assert(encPlan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_pq_encode")),
      s"encode projection not codegen'd:\n$encPlan")
    val adc = Pq.adcTopK(Pq.encode(emb, "vec_id", "embedding", cb), cb,
      "vec_id", queriesDf, "q_id", "q_vec", k = 5)
    adc.collect() // materialize THIS df's AQE final plan before reading it
    val adcPlan = adc.queryExecution.executedPlan.toString
    assert(adcPlan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_pq_adc")),
      s"the ADC scoring projection fell out of codegen:\n$adcPlan")
  }

  test("the shortlist plan reads codes, not vectors (the compression claim)") {
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    codes.write.mode("overwrite").parquet(dir)
    val out = Pq.adcTopK(spark.read.parquet(dir), cb, "vec_id",
      queriesDf, "q_id", "q_vec", k = 10)
    assert(out.count() == 80)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val codeScan = scans(out.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("graft-pq")))
    assert(codeScan.isDefined, "no scan over the persisted code relation")
    val schema = codeScan.get.schema.fieldNames.toSet
    assert(schema == Set("vec_id", "pq_code"),
      s"shortlist scan should read only (vec_id, pq_code), got $schema")
  }

  test("fit on an empty corpus fails with a named error, not NoSuchElementException") {
    val e = intercept[IllegalArgumentException] {
      Pq.fit(emb.where(lit(false)), "embedding", m = 4, ksub = 2)
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
  }

  test("an oversized maxFitRows is rejected instead of overflowing limit()") {
    val e = intercept[IllegalArgumentException] {
      Pq.fit(emb, "embedding", m = 4, ksub = 2, maxFitRows = Long.MaxValue)
    }
    assert(e.getMessage.contains("Int.MaxValue"), e.getMessage)
  }

  test("measured-slack ADC gate is lossless: no neighbor the exact computation keeps is dropped") {
    import graft.functions.VectorOps.{dotCol, unitNorm}
    val minCos = 0.45
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val maxEps = Pq.maxQuantizationError(codes, cb, "vec_id", emb, "embedding")
    assert(maxEps > 0.0 && maxEps < 1.0, s"implausible maxEps=$maxEps")
    val slack = Pq.losslessSlack(minCos, maxEps)

    // offset query ids so each query's own corpus original is a planted
    // exact neighbor (cos 1.0) rather than excluded as a self-pair
    val qdf = emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("q_id"), col("embedding").as("q_vec"))
    val got = Pq.streamingNeighbors(qdf, "q_id", "q_vec",
        codes, cb, "vec_id", emb, "embedding", minCos, adcSlack = slack)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    // exact reference: every (query, corpus) pair at cos >= minCos
    val qn = qdf.select(col("q_id"), unitNorm(col("q_vec")).as("_qn"))
    val cn = emb.select(col("vec_id"), unitNorm(col("embedding")).as("_vn"))
    val exact = cn.crossJoin(qn).where(col("vec_id") =!= col("q_id"))
      .where(round(dotCol(col("_qn"), col("_vn")), 6) >= minCos)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "sanity: the threshold should match some pairs")
    assert(got == exact,
      s"measured-slack gate diverged: missing=${(exact -- got).take(5)} " +
        s"extra=${(got -- exact).take(5)}")
  }

  test("no window operator in the ANN plans (heap-aggregated shortlists)") {
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val out = Pq.topKRerank(codes, cb, "vec_id", emb, "embedding",
      queriesDf, "q_id", "q_vec", k = 5)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number"),
      s"PQ rerank plan still ranks via a window:\n$plan")
  }
}
