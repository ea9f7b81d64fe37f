package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-PQ ([[IvfPq]]): the two-level ADC identity (exact distance to
  * centroid + residual-code reconstruction), candidate locality (every
  * result from a probed cell), recall vs brute force, and the no-all-pairs
  * plan guard.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def queriesDf =
    emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private lazy val index =
    IvfPq.build(emb, "vec_id", "embedding", nCells = 16, m = 16, ksub = 64, seed = 42L)

  test("two-level ADC == exact distance to centroid+residual reconstruction") {
    // production kernels end-to-end: take real codes from the built index,
    // a real residual query, and pin adc(code, q−ctr) == ‖q − (ctr +
    // decode(code))‖² on every sampled pair
    val sample = index.assigned.select("vec_id", "cell", "pq_code")
      .limit(20).as[(Long, Int, Seq[Short])].collect()
    assert(sample.length == 20)
    val qn = graft.functions.VectorOps.unitNorm(
      graft.functions.VectorOps.asDouble(col("embedding")))
    val q = emb.where(col("vec_id") === 3).select(qn.as("v"))
      .as[Seq[Double]].head().toArray
    sample.foreach { case (_, cell, code) =>
      val ctr = index.centers(cell)
      val qres = q.indices.map(i => q(i) - ctr(i)).toArray
      val adc = graft.functions.PqKernels.adc(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(code.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(qres),
        index.cb.centers)
      val recon = Pq.decode(code, index.cb).zip(ctr).map { case (r, c) => r + c }
      val exact = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - exact) < 1e-9,
        s"cell=$cell: adc=$adc != exact-to-reconstruction=$exact")
    }
  }

  test("every result comes from one of the query's probed cells") {
    val nProbe = 4
    val out = IvfPq.probe(index, emb, "embedding", queriesDf,
      "q_id", "q_vec", k = 10, nProbe = nProbe)
    val cellOf = index.assigned.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    // replicate the probe's cell ranking driver-side: euclidean distance of
    // the unit-normalized query to each centroid, nProbe nearest (tie: cell)
    val qvecs = emb.where(col("vec_id") < 8)
      .select(col("vec_id"), graft.functions.VectorOps.unitNorm(
        graft.functions.VectorOps.asDouble(col("embedding"))).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    out.select("q_id", "vec_id").as[(Long, Long)].collect().foreach {
      case (qid, vid) =>
        val q = qvecs(qid)
        val probed = index.centers.zipWithIndex.map { case (c, i) =>
          (c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, i)
        }.sortBy(identity).take(nProbe).map(_._2).toSet
        assert(probed.contains(cellOf(vid)),
          s"($qid,$vid): cell ${cellOf(vid)} not among probed $probed")
    }
  }

  test("recall vs brute force") {
    val q = queriesDf
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = IvfPq.probe(index, emb, "embedding", q, "q_id", "q_vec",
        k = 10, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    info(f"IVF-PQ recall@10 (nProbe=4/16 cells): $recall%.3f")
    assert(recall >= 0.5, s"IVF-PQ recall degraded: $recall")
  }

  test("disk round-trip: probe(load(save(index))) == probe(built index)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfPq.save(index, spark, dir)
    val loaded = IvfPq.load(spark, dir, "vec_id")
    assert(loaded.centers.length == index.centers.length)
    assert(loaded.cb.m == index.cb.m && loaded.cb.dsub == index.cb.dsub)
    val a = IvfPq.probe(index, emb, "embedding", queriesDf,
        "q_id", "q_vec", k = 10, nProbe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    val b = IvfPq.probe(loaded, emb, "embedding", queriesDf,
        "q_id", "q_vec", k = 10, nProbe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a == b, "loaded-index probe diverged from the built index")
  }

  test("gate probe path (cached index) == cold fit path") {
    import graft.queries.SimilarityQueries
    val cold = SimilarityQueries.annIvfPq(spark, sf001).collect().toSeq
    val probe = SimilarityQueries.annIvfPqProbe(spark, sf001).collect().toSeq
    assert(cold == probe, "cached-index probe diverged from the cold path")
  }

  test("probe plan: cell equi-join, never all-pairs") {
    val out = IvfPq.probe(index, emb, "embedding", queriesDf,
      "q_id", "q_vec", k = 10, nProbe = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"IVF-PQ probe went all-pairs:\n$plan")
  }

  test("append: new vectors join a saved index without retraining and are found at cos 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    // corpus excludes ids < 100; queries are ids < 8 — absent from the index
    val corpusA = emb.where(col("vec_id") >= 100)
    val idxA = IvfPq.build(corpusA, "vec_id", "embedding",
      nCells = 16, m = 16, ksub = 64, seed = 42L)
    try {
      IvfPq.save(idxA, spark, dir)
      IvfPq.saveVectors(corpusA, "vec_id", "embedding", dir, nFiles = 8)
      val nA = corpusA.count()

      val before = IvfPq.probeSaved(spark, dir, "vec_id", "embedding",
          queriesDf, "q_id", "q_vec", k = 5, nProbe = 4)
        .where(col("cos_sim") >= 0.999999).count()
      assert(before == 0, s"exact matches present before append: $before")

      // append exact copies of the queries under fresh ids
      val batch = emb.where(col("vec_id") < 8)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
      val appended = IvfPq.append(spark, dir, "vec_id", "embedding", batch)
      assert(appended == 8, s"appended=$appended")

      val reloaded = spark.read.parquet(s"$dir/assigned")
      assert(reloaded.count() == nA + 8, "appended codes missing from the relation")
      assert(reloaded.where(col("vec_id") >= 10000L)
        .where(col("cell") < 0 || col("cell") >= 16).count() == 0,
        "appended rows landed outside the existing cell range")

      // each query's nearest cell is its duplicate's assigned cell (same
      // vector, same frozen quantizer) — rank-1 probe must find it exactly
      val after = IvfPq.probeSaved(spark, dir, "vec_id", "embedding",
          queriesDf, "q_id", "q_vec", k = 5, nProbe = 4)
      val hits = after.where(col("rank") === 1)
        .select("q_id", "vec_id", "cos_sim")
        .as[(Long, Long, Double)].collect()
        .map { case (q, v, c) => q -> (v, c) }.toMap
      (0L until 8L).foreach { q =>
        val (v, c) = hits(q)
        assert(v == q + 10000L && c == 1.0,
          s"query $q: expected appended duplicate ${q + 10000L} at cos 1.0, got ($v, $c)")
      }
    } finally idxA.unpersist()
  }

  test("appendOrRebuild: in-distribution appends are a no-op; drifted appends retrain and recover") {
    val dirM = java.nio.file.Files.createTempDirectory("graft-ivfpq-drift").toString
    val dirF = java.nio.file.Files.createTempDirectory("graft-ivfpq-frozen").toString
    val corpusA = emb.where(col("vec_id") >= 100)
    val idxA = IvfPq.build(corpusA, "vec_id", "embedding",
      nCells = 16, m = 16, ksub = 64, seed = 42L)
    try {
      for (d <- Seq(dirM, dirF)) {
        IvfPq.save(idxA, spark, d)
        IvfPq.saveVectors(corpusA, "vec_id", "embedding", d, nFiles = 8)
      }
      IvfPq.saveFitStats(spark, dirM, idxA, corpusA, "embedding")
      val fitMse = IvfPq.loadFitMse(spark, dirM).get
      assert(fitMse > 0.0)

      // in-distribution batch: real embeddings under fresh ids — append,
      // no retrain (centers and baseline byte-identical), rows landed
      val sameDist = emb.where(col("vec_id") >= 8 && col("vec_id") < 58)
        .select((col("vec_id") + 20000L).as("vec_id"), col("embedding"))
      assert(!IvfPq.appendOrRebuild(spark, dirM, "vec_id", "embedding", sameDist))
      assert(IvfPq.load(spark, dirM, "vec_id").centers.map(_.toSeq).toSeq ==
        idxA.centers.map(_.toSeq).toSeq, "no-op append must not retrain")
      assert(IvfPq.loadFitMse(spark, dirM).get == fitMse)
      assert(spark.read.parquet(s"$dirM/assigned")
        .where(col("vec_id") >= 20000L).count() == 50)

      // drifted batch: every other coordinate sign-flipped — off the
      // fitted distribution, must trip the 2x band and retrain
      val drifted = emb.where(col("vec_id") < 8)
        .select((col("vec_id") + 30000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(pmod(i, lit(2)) === 0, -x).otherwise(x))
            .as("embedding"))
      val idxFrozen = IvfPq.load(spark, dirM, "vec_id")
      val driftedMse = IvfPq.quantizationMse(idxFrozen, drifted, "embedding")
      info(f"fit mse=$fitMse%.4f drifted-batch mse=$driftedMse%.4f " +
        f"(${driftedMse / fitMse}%.1fx)")
      assert(IvfPq.appendOrRebuild(spark, dirM, "vec_id", "embedding", drifted,
          driftFactor = 1.5),
        s"drifted batch (mse ${driftedMse / fitMse}x fit) did not trigger a rebuild")
      assert(IvfPq.load(spark, dirM, "vec_id").centers.map(_.toSeq).toSeq !=
        idxA.centers.map(_.toSeq).toSeq, "rebuild did not retrain the quantizers")
      assert(IvfPq.loadFitMse(spark, dirM).get != fitMse,
        "rebuild did not refresh the baseline")

      // frozen twin: the same two batches via plain append, no retrain
      IvfPq.append(spark, dirF, "vec_id", "embedding", sameDist)
      IvfPq.append(spark, dirF, "vec_id", "embedding", drifted)

      // recovery: near the drifted cluster, the rebuilt index must match
      // brute force at least as well as the frozen one, and find each
      // drifted vector's exact copy at rank 1 / cos 1.0
      val dq = drifted.select((col("vec_id") - 30000L).as("q_id"),
        col("embedding").as("q_vec")).localCheckpoint()
      val all = corpusA.select("vec_id", "embedding")
        .unionByName(sameDist).unionByName(drifted)
      val brute = Similarity.bruteForceTopK(all, dq, "vec_id", "embedding",
          "q_id", "q_vec", 10)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      def recallOf(dir: String): Double = {
        val got = IvfPq.probeSaved(spark, dir, "vec_id", "embedding", dq,
            "q_id", "q_vec", k = 10, nProbe = 4)
          .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
        (brute & got).size.toDouble / brute.size
      }
      val (rRebuilt, rFrozen) = (recallOf(dirM), recallOf(dirF))
      info(f"drifted-query recall@10: rebuilt=$rRebuilt%.3f frozen=$rFrozen%.3f")
      // k-means retraining is input-order-sensitive, so the two recalls
      // jitter run to run — allow one-result slack on the comparison;
      // the deterministic recovery evidence is the rank-1 block below
      assert(rRebuilt + 0.11 >= rFrozen,
        s"rebuild lost recall: $rRebuilt vs frozen $rFrozen")
      assert(rRebuilt >= 0.5, s"post-rebuild recall degraded: $rRebuilt")
      val hits = IvfPq.probeSaved(spark, dirM, "vec_id", "embedding", dq,
          "q_id", "q_vec", k = 5, nProbe = 4)
        .where(col("rank") === 1)
        .select("q_id", "vec_id", "cos_sim")
        .as[(Long, Long, Double)].collect()
        .map { case (q, v, c) => q -> ((v, c)) }.toMap
      (0L until 8L).foreach { q =>
        assert(hits(q) == ((q + 30000L, 1.0)),
          s"query $q: expected its drifted copy at cos 1.0, got ${hits(q)}")
      }
    } finally idxA.unpersist()
  }

  test("probeSaved == probe, and its re-rank fetch prunes the vector scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-pf").toString
    IvfPq.save(index, spark, dir)
    IvfPq.saveVectors(emb, "vec_id", "embedding", dir, nFiles = 16)

    val a = IvfPq.probeSaved(spark, dir, "vec_id", "embedding", queriesDf,
        "q_id", "q_vec", k = 10, nProbe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    val b = IvfPq.probe(index, emb, "embedding", queriesDf,
        "q_id", "q_vec", k = 10, nProbe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a == b, "probeSaved diverged from the lazy probe")

    // measured skipping (the ZOrderSpec pattern): a point-fetch of a few
    // ids from the id-clustered relation must materialize a fraction of
    // the relation; the same fetch against an id-shuffled naive layout
    // cannot skip (every file's id stats straddle)
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.map(_.metrics("numOutputRows").value).sum
    }
    val total = emb.count()
    val ids: Seq[Any] = Seq(3L, 7L, 11L, 200L, 201L)
    val clustered = scanRows(IvfPq.fetchVectors(
      IvfPq.loadVectors(spark, dir), "vec_id", ids))
    emb.select("vec_id", "embedding").repartition(16)
      .write.mode("overwrite").parquet(s"$dir/naive")
    val naive = scanRows(IvfPq.fetchVectors(
      spark.read.parquet(s"$dir/naive"), "vec_id", ids))
    assert(naive == total,
      s"naive layout unexpectedly skipped: $naive of $total")
    assert(clustered * 2 <= naive,
      s"id-clustered fetch skipped too little: $clustered of $naive")
    info(f"re-rank fetch materialized: naive=$naive clustered=$clustered " +
      f"(${clustered.toDouble / naive}%.2f of naive)")

    // the saved code relation is likewise id-sorted within each cell: a
    // bounded id fetch prunes row groups there too
    val codesAll = spark.read.parquet(s"$dir/assigned")
    val codeFetch = scanRows(codesAll.where(col("vec_id").isin(ids: _*)))
    assert(codeFetch < total,
      s"code point-fetch read the whole index: $codeFetch of $total")
  }
}
