package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Dev profiling: time each dedup pipeline stage in isolation. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name ($n rows)")
    }

    time("docs count")(docs.count())
    time("normWords")(docs.select(normWords(col("text")).as("w")).selectExpr("sum(size(w))").head().getLong(0))
    time("shingles")(docs.select(shingles(normWords(col("text")), 3).as("s")).selectExpr("sum(size(s))").head().getLong(0))
    time("sigs (fused)")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("sigs again")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("bands")(Dedup.lshBands(Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id").count())
    time("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("ngram")(Dedup.ngramJaccard(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
