package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level timing for the dedup_clusters path (regression diagnosis). */
object DiagClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = sys.env.getOrElse("DIAG_MODE", "cold")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    timed("warmup docs.count")(docs.count())
    if (mode == "tinywarm") {
      // does a 100-doc pass through the same operators kill the cold cost?
      timed("tiny minhashCandidates") {
        Dedup.minhashCandidates(docs.limit(100), "doc_id", "text").count()
      }
      timed("tiny ngramJaccard") {
        Dedup.ngramJaccard(docs.limit(100), "doc_id", "text", 0.5).count()
      }
    }
    timed("clusters() #1")(Dedup.clusters(docs, "doc_id", "text", 0.5).count())
    timed("clusters() #2")(Dedup.clusters(docs, "doc_id", "text", 0.5).count())
    timed("curate #1") {
      graft.operators.Curate.curate(docs, "doc_id", "text",
        minQuality = 0.5, lang = Some("en"), jaccardThreshold = 0.5).count()
    }
    timed("curate #2") {
      graft.operators.Curate.curate(docs, "doc_id", "text",
        minQuality = 0.5, lang = Some("en"), jaccardThreshold = 0.5).count()
    }
    spark.stop()
  }
}
