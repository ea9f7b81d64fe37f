package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Pq

/** Dev profiling: PQ codebook fit wall-clock at sf0.1 (the dominant cost
  * of the cold ann_pq / ann_ivfpq gates). */
object ProfPqFit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    println(s"corpus: ${e.count()} vectors")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name")
    }
    (1 to 3).foreach { rep =>
      time(s"Pq.fit m=16 ksub=64 rep$rep")(
        Pq.fit(e, "embedding", 16, 64, seed = 42L): Unit)
    }
    spark.stop()
  }
}
