package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.TextQueries

/** Dev profiling: corpus_curate end-to-end timing. */
object ProfCurate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/documents.parquet").count() // warm
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = TextQueries.corpusCurate(spark, dir).count()
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  corpus_curate run $i ($n rows)")
    }
    spark.stop()
  }
}
