package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Opq]]: the learned rotation must be orthonormal, must strictly cut
  * quantization error vs plain PQ (iters=0 ablation — identical fit
  * machinery, identity rotation) on cross-block-correlated data, and the
  * full rotated-ADC + exact-re-rank pipeline must report EXACT cosines
  * with competitive recall. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  /** Cross-block-correlated vectors: a low-rank latent Gaussian mixed
    * into d=16 by a fixed deterministic matrix + small noise. Every
    * coordinate block shares latent variance — exactly the structure
    * plain PQ's independent blocks waste codebook entries on. */
  private lazy val correlated: DataFrame = {
    val d = 16; val latent = 3
    val rng = new java.util.Random(7L)
    val mix = Array.fill(latent, d)(rng.nextGaussian())
    val rows = (0 until 3000).map { i =>
      val z = Array.fill(latent)(rng.nextGaussian())
      val v = Array.tabulate(d) { t =>
        (0 until latent).map(l => z(l) * mix(l)(t)).sum + 0.05 * rng.nextGaussian()
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def queriesOf(df: DataFrame, n: Int): DataFrame =
    df.where(col("vec_id") % 97 === 0).limit(n)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("rotation is orthonormal (RᵀR == I within float tolerance)") {
    val model = Opq.fit(correlated, "embedding", m = 8, ksub = 16, iters = 3)
    val d = model.dim
    for (a <- 0 until d; b <- 0 until d) {
      var s = 0.0
      for (j <- 0 until d) s += model.flat(j * d + a).toDouble * model.flat(j * d + b)
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-3, s"RtR($a,$b)=$s")
    }
  }

  test("learned rotation strictly cuts quantization error vs the iters=0 ablation") {
    val plain = Opq.fit(correlated, "embedding", m = 8, ksub = 16, iters = 0)
    val opq = Opq.fit(correlated, "embedding", m = 8, ksub = 16, iters = 4)
    val ePlain = Opq.meanQuantizationError(correlated, "embedding", plain)
    val eOpq = Opq.meanQuantizationError(correlated, "embedding", opq)
    assert(eOpq < ePlain,
      s"rotation did not help: opq=$eOpq plain=$ePlain")
    info(f"mean squared quantization error: plain=$ePlain%.5f opq=$eOpq%.5f " +
      f"(${eOpq / ePlain}%.2f of plain)")
    // on this strongly-correlated data the win should be substantial
    // (measured ~0.85× across seeds; guard at 0.90× so data-gen jitter
    // can't flake while a real regression to parity still trips)
    assert(eOpq <= 0.9 * ePlain, s"win too small: $eOpq vs $ePlain")
  }

  test("rotated-ADC + exact re-rank: exact cosines, recall >= plain PQ's") {
    val qs = queriesOf(correlated, 8)
    val k = 10
    val exact = Similarity.bruteForceTopK(correlated, qs,
        "vec_id", "embedding", "q_id", "q_vec", k)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    def run(iters: Int) = Opq.topK(correlated, qs, "vec_id", "embedding",
        "q_id", "q_vec", k, m = 8, ksub = 16, iters = iters)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val opq = run(4)
    val plain = run(0)

    // reported similarities are EXACT (rotation-invariant original-space
    // re-rank): every returned pair matches the brute-force cosine
    val exactByPair = exact.map(r => (r._1, r._2) -> r._3).toMap
    opq.foreach { case (q, id, cos) =>
      exactByPair.get((q, id)).foreach(e => assert(math.abs(e - cos) < 1e-9,
        s"($q,$id): opq $cos != exact $e"))
    }

    def recall(got: Array[(Long, Long, Double)]) = {
      val want = exact.map(r => (r._1, r._2)).toSet
      got.count(r => want((r._1, r._2))).toDouble / want.size
    }
    val rOpq = recall(opq)
    val rPlain = recall(plain)
    info(f"recall@$k: opq=$rOpq%.3f plain-pq=$rPlain%.3f")
    assert(rOpq >= 0.85, s"opq recall $rOpq")
    assert(rOpq >= rPlain - 0.05,
      s"rotation degraded recall: $rOpq vs plain $rPlain")
  }

  test("OPQ + IVF-PQ composition: exact cosines, high recall at wide probe") {
    val qs = queriesOf(correlated, 6)
    val k = 10
    val got = Opq.ivfTopK(correlated, qs, "vec_id", "embedding",
        "q_id", "q_vec", k, nCells = 8, nProbe = 6, m = 8, ksub = 16)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(correlated, qs,
        "vec_id", "embedding", "q_id", "q_vec", k)
      .select("q_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(got.groupBy(_._1).forall(_._2.length == k))
    val exactByPair = exact.map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (q, id, cos) =>
      exactByPair.get((q, id)).foreach(e => assert(math.abs(e - cos) < 1e-9))
    }
    val want = exact.map(r => (r._1, r._2)).toSet
    val recall = got.count(r => want((r._1, r._2))).toDouble / want.size
    info(f"opq-ivfpq recall@$k: $recall%.3f")
    assert(recall >= 0.7, s"recall $recall")
  }

  test("disk round-trip: probing a loaded model reproduces the in-memory probe") {
    val root = java.nio.file.Files.createTempDirectory("graft-opq").toString + "/idx"
    val model = Opq.fit(correlated, "embedding", m = 8, ksub = 16, iters = 2)
    val codes = Opq.encode(correlated, "vec_id", "embedding", model)
    val qs = queriesOf(correlated, 5)
    def probe(m: Opq.Model, c: org.apache.spark.sql.DataFrame) =
      Opq.topKRerank(c, m, "vec_id", correlated, "embedding",
          qs, "q_id", "q_vec", 10)
        .select("q_id", "vec_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val want = probe(model, codes)
    Opq.save(model, codes, "vec_id", spark, root, nFiles = 4)
    val (loaded, loadedCodes) = Opq.load(spark, root)
    assert(loaded.dim == model.dim &&
      java.util.Arrays.equals(loaded.flat, model.flat))
    assert(probe(loaded, loadedCodes) == want,
      "loaded model must probe identically")
  }

  test("gate wiring: ann_opq runs on the embeddings table; probe == cold") {
    val cold = graft.queries.SimilarityQueries.annOpq(spark, sf001)
      .collect().toSeq
    val probe = graft.queries.SimilarityQueries.annOpqProbe(spark, sf001)
      .collect().toSeq
    assert(cold.nonEmpty && cold == probe,
      "cached-index probe must reproduce the cold path exactly")
  }
}
