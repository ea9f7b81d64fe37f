package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PCA-reduced IVF ANN ([[PcaAnn]]): the reduce-then-index composition.
  * Pins (1) recall vs the UNREDUCED IVF twin at matched nProbe on real
  * embeddings, (2) near-lossless recall on planted low-rank data (the
  * regime PCA reduction exists for), (3) exactness of reported cosines
  * (reduction may only cost recall, never score), (4) the measured
  * index shrink (stored vectors are pcaK-dim), and (5) the no-all-pairs
  * plan guard. */
class PcaAnnSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def queriesDf =
    emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("recall vs the unreduced IVF twin at matched nProbe; cosines exact; index 4x smaller") {
    val e = emb
    val q = queriesDf
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet

    val index = PcaAnn.build(e, "vec_id", "embedding",
      pcaK = 16, nCells = 16, seed = 42L)
    val reduced = PcaAnn.probe(index, e, "embedding", q, "q_id", "q_vec",
      k = 10, nProbe = 4)
    val plan = reduced.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs probe:\n$plan")

    val got = reduced.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val unreduced = Ivf.topK(e, q, "vec_id", "embedding", "q_id", "q_vec",
        k = 10, nCells = 16, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val rReduced = (brute & got).size.toDouble / brute.size
    val rUnreduced = (brute & unreduced).size.toDouble / brute.size
    info(f"recall@10 nProbe=4: reduced(16/64)=$rReduced%.3f unreduced=$rUnreduced%.3f")
    // comparative assert with the documented k-means jitter slack: the
    // reduced index must stay within 0.15 of its unreduced twin even on
    // this near-isotropic synthetic corpus (the hostile case for PCA)
    assert(rReduced >= rUnreduced - 0.15,
      s"PCA reduction cost too much recall: $rReduced vs $rUnreduced")

    // reported cosines are EXACT original-space values: every returned
    // (q, id) pair matches the brute-force score bit-for-bit (same
    // unitNorm/dot/round kernels)
    val bruteScores = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "q_id", "q_vec", 500)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => ((a, b), s) }.toMap
    val mismatches = reduced.select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, s) => bruteScores.get((a, b)).exists(_ != s) }
    assert(mismatches.isEmpty,
      s"re-rank scores diverge from exact: ${mismatches.take(3).mkString(", ")}")

    // the scan-shrink the reduction buys: stored index vectors are 16-dim
    // (4x fewer doubles per vector than the 64-dim corpus)
    val storedLen = index.ivf.assigned
      .select(size(col("_vn"))).as[Int].head()
    assert(storedLen == 16, s"index stores $storedLen-dim vectors, wanted 16")
    index.unpersist()
  }

  test("planted low-rank corpus: reduced recall matches unreduced (the regime PCA is for)") {
    // rank-3 signal in 64 dims + tiny noise: PCA@16 captures essentially
    // all variance, so the reduced-space shortlist sees the same geometry
    val rng = new scala.util.Random(11L)
    val basis = Array.fill(3)(Array.fill(64)(rng.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val c = Array(rng.nextGaussian() * 10, rng.nextGaussian() * 5,
        rng.nextGaussian() * 2)
      (i.toLong, (0 until 64).map(j =>
        c(0) * basis(0)(j) + c(1) * basis(1)(j) + c(2) * basis(2)(j) +
          rng.nextGaussian() * 0.01).toArray)
    }
    val e = rows.toDF("vec_id", "embedding").repartition(8)
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val rReduced = recallOf(PcaAnn.topK(e, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 10, pcaK = 16, nCells = 8, nProbe = 3))
    val rUnreduced = recallOf(Ivf.topK(e, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 10, nCells = 8, nProbe = 3))
    info(f"planted-rank recall@10: reduced=$rReduced%.3f unreduced=$rUnreduced%.3f")
    assert(rReduced >= rUnreduced - 0.1,
      s"reduced recall $rReduced below unreduced $rUnreduced on low-rank data")
    assert(rReduced >= 0.6, s"reduced recall degraded outright: $rReduced")
  }

  test("probe after build == one-shot topK (same seed, deterministic composition)") {
    val e = emb
    val q = queriesDf
    val index = PcaAnn.build(e, "vec_id", "embedding",
      pcaK = 16, nCells = 16, seed = 42L)
    val viaProbe = PcaAnn.probe(index, e, "embedding", q, "q_id", "q_vec",
        k = 10, nProbe = 4)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    val oneShot = PcaAnn.topK(e, q, "vec_id", "embedding", "q_id", "q_vec",
        k = 10, pcaK = 16, nCells = 16, nProbe = 4, seed = 42L)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaProbe == oneShot)
    index.unpersist()
  }
}
