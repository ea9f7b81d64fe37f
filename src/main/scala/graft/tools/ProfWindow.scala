package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Dev profiling: where does q_window_running's bench time go? */
object ProfWindow {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name ($n rows)")
    }

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    time("orders count")(orders.count())
    time("orders count again")(orders.count())
    time("window op only")(graft.operators.Analytics.runningOrderStats(orders).count())
    time("full gate query (with orderBy)")(AnalyticsQueries.windowRunning(spark, dir).count())
    time("full gate query again")(AnalyticsQueries.windowRunning(spark, dir).count())
    println(AnalyticsQueries.windowRunning(spark, dir).queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
