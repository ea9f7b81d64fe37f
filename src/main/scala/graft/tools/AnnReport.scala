package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Measured recall / wall-clock matrix for EVERY ANN path against the
  * brute-force ground truth on the real embeddings table — the
  * consolidated measure-don't-guess view of the family's quality/cost
  * trade (per-path recalls are also spec-pinned individually; this tool
  * puts them side by side on identical queries).
  *
  * `runMain graft.tools.AnnReport [sfDir] [nQueries]` — prints one line
  * per path: recall@10 vs brute force, exact-cosine agreement on
  * returned pairs, and the path's wall-clock (cold: includes any
  * training; the gate's `*_probe` twins price the deployment half).
  */
object AnnReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQ = args.lift(1).map(_.toInt).getOrElse(16)
    val k = 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.load(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    val qs = e.where(col("vec_id") % 89 === 0).limit(nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = qs.count()
    println(s"corpus: $n vectors ($sfDir), $nq queries, k=$k")

    def pairs(df: DataFrame): Map[(Long, Long), Double] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"),
          col("cos_sim").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val truth = pairs(Similarity.bruteForceTopK(e, qs,
      "vec_id", "embedding", "q_id", "q_vec", k))

    def report(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = pairs(f)
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = got.keys.count(truth.contains)
      val recall = hits.toDouble / truth.size
      // exact-cosine agreement: every returned pair that IS a true pair
      // must carry the brute-force cosine (exact re-rank contract)
      val exact = got.forall { case (p, c) =>
        truth.get(p).forall(t => math.abs(t - c) < 1e-9)
      }
      println(f"$name%-14s recall@$k=$recall%.3f exact_cos=$exact%-5s $sec%6.2f s")
    }

    report("brute")(Similarity.bruteForceTopK(e, qs,
      "vec_id", "embedding", "q_id", "q_vec", k))
    report("lsh")(Similarity.lshTopK(e, qs, "vec_id", "embedding",
      "q_id", "q_vec", k, nTables = 12, planesPerTable = 4, dim = 64,
      multiProbe = true))
    report("ivf")(Ivf.topK(e, qs, "vec_id", "embedding",
      "q_id", "q_vec", k, nCells = 16, nProbe = 4))
    report("sq8")(Sq.topK(e, qs, "vec_id", "embedding", "q_id", "q_vec", k))
    report("pq")(Pq.topK(e, qs, "vec_id", "embedding", "q_id", "q_vec",
      k, m = 16, ksub = 64))
    report("ivfpq")(IvfPq.topK(e, qs, "vec_id", "embedding", "q_id", "q_vec",
      k, nCells = 16, nProbe = 4, m = 16, ksub = 64))
    report("opq")(Opq.topK(e, qs, "vec_id", "embedding", "q_id", "q_vec",
      k, m = 16, ksub = 64))
    report("opq-ivfpq")(Opq.ivfTopK(e, qs, "vec_id", "embedding",
      "q_id", "q_vec", k, nCells = 16, nProbe = 4, m = 16, ksub = 64))
  }
}
