package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pca]]: the Jacobi eigensolve against hand-checkable matrices, model
  * invariants (orthonormality, ordering, sign convention, determinism),
  * exactness on planted low-rank data, and the variance/reconstruction
  * identity measured on data. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen: exact on a hand-computed 2x2; reconstructs a random symmetric 8x8") {
    // [[3,1],[1,3]] → eigenvalues 4 and 2, eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals2, vecs2) = Pca.jacobiEigen(Array(Array(3.0, 1.0), Array(1.0, 3.0)))
    assert(vals2.sorted.zip(Seq(2.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val hi = if (vals2(0) > vals2(1)) 0 else 1
    assert(math.abs(math.abs(vecs2(0)(hi)) - math.sqrt(0.5)) < 1e-12)

    val rng = new scala.util.Random(3L)
    val m = Array.ofDim[Double](8, 8)
    for (i <- 0 until 8; j <- i until 8) { val x = rng.nextGaussian(); m(i)(j) = x; m(j)(i) = x }
    val (vals, vecs) = Pca.jacobiEigen(m)
    // A·V == V·Λ, column by column
    for (c <- 0 until 8; r <- 0 until 8) {
      val av = (0 until 8).map(x => m(r)(x) * vecs(x)(c)).sum
      assert(math.abs(av - vals(c) * vecs(r)(c)) < 1e-9,
        s"eigen residual at ($r,$c)")
    }
  }

  test("fit: orthonormal components, descending shares, planted rank recovered, deterministic") {
    // planted 3-dim signal embedded in 16 dims + tiny noise
    val rng = new scala.util.Random(7L)
    val basis = Array.fill(3)(Array.fill(16)(rng.nextGaussian()))
    val rows = (0 until 2000).map { _ =>
      val c = Array(rng.nextGaussian() * 10, rng.nextGaussian() * 5, rng.nextGaussian() * 2)
      (0 until 16).map(j =>
        c(0) * basis(0)(j) + c(1) * basis(1)(j) + c(2) * basis(2)(j) +
          rng.nextGaussian() * 0.01).toSeq
    }
    val df = rows.toDF("vec").repartition(8)
    val m = Pca.fit(df, "vec", k = 5)
    // orthonormal rows
    for (a <- 0 until 5; b <- 0 until 5) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"CtC broken at ($a,$b)")
    }
    // shares sorted desc, first 3 carry essentially everything
    assert(m.varianceShare.sliding(2).forall { case Array(x, y) => x >= y - 1e-12 })
    assert(m.varianceShare.take(3).sum > 0.999,
      s"planted rank-3 signal not captured: ${m.varianceShare.toSeq}")
    // deterministic refit
    val m2 = Pca.fit(df, "vec", k = 5)
    assert(m.components.flatten.toSeq == m2.components.flatten.toSeq)

    // reconstruction identity: mse(k) ≈ residual variance; k=3 ≈ noise
    val mse3 = Pca.reconstructionMse(df, "vec", Pca.fit(df, "vec", 3))
    val mse1 = Pca.reconstructionMse(df, "vec", Pca.fit(df, "vec", 1))
    assert(mse3 < 0.01 * mse1, s"rank-3 residual not tiny: $mse3 vs rank-1 $mse1")
    assert(mse1 > mse3, "more components must never reconstruct worse")
  }

  test("projection is map-side (no shuffle) and preserves geometry at full rank") {
    val rng = new scala.util.Random(5L)
    val rows = (0L until 300L).map(i => (i, Seq.fill(8)(rng.nextGaussian())))
    val df = rows.toDF("id", "vec")
    val m = Pca.fit(df, "vec", k = 8)
    val out = Pca.transform(df, "vec", m)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "projection must not shuffle")
    // full-rank projection is a rigid motion of the centered cloud:
    // pairwise distances are preserved
    val full = out.select("id", "vec", "pca_vec")
      .as[(Long, Seq[Double], Seq[Double])].collect().sortBy(_._1)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0 until 20; j <- i + 1 until 20) {
      val orig = d2(full(i)._2, full(j)._2)
      val proj = d2(full(i)._3, full(j)._3)
      assert(math.abs(orig - proj) < 1e-9 * math.max(1.0, orig),
        s"distance not preserved at ($i,$j): $orig vs $proj")
    }
  }

  test("ANN composition: PCA to the signal rank keeps brute-force recall; isotropic data is honest") {
    // structured corpus: rank-3 signal in 16 dims + tiny noise — the
    // regime dimensionality reduction EXISTS for
    val rng = new scala.util.Random(13L)
    val basis = Array.fill(3)(Array.fill(16)(rng.nextGaussian()))
    val rows = (0L until 1500L).map { i =>
      val c = Array(rng.nextGaussian() * 10, rng.nextGaussian() * 5, rng.nextGaussian() * 2)
      (i, (0 until 16).map(j =>
        c(0) * basis(0)(j) + c(1) * basis(1)(j) + c(2) * basis(2)(j) +
          rng.nextGaussian() * 0.01).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding").localCheckpoint()
    val m = Pca.fit(corpus, "embedding", k = 4)
    val reduced = Pca.transform(corpus, "embedding", m)
      .select(col("vec_id"), col("pca_vec").as("embedding"))
      .localCheckpoint()
    def top10(c: org.apache.spark.sql.DataFrame) = {
      val q = c.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(c, q, "vec_id", "embedding",
          "q_id", "q_vec", 10)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    }
    val (brute, red) = (top10(corpus), top10(reduced))
    val recall = (brute & red).size.toDouble / brute.size
    info(f"PCA 16→4 brute-force recall@10 on rank-3 data: $recall%.3f " +
      f"(variance share ${m.varianceShare.sum}%.4f)")
    assert(m.varianceShare.sum > 0.999)
    assert(recall >= 0.9, s"signal-rank reduction lost recall: $recall")

    // honesty on ISOTROPIC data: the variance share itself says half the
    // dims carry only ~half the energy — the model's share is the
    // documented decision signal, not a free lunch
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val iso = Pca.fit(emb, "embedding", k = 32)
    info(f"isotropic embeddings: top-32/64 variance share ${iso.varianceShare.sum}%.3f")
    assert(iso.varianceShare.sum < 0.9,
      "synthetic embeddings should read as near-isotropic — share says don't reduce")
  }
}
