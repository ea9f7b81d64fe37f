package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ChangeFeed

/** Dev profiling: where does q_cdc_replicate's time go at sf0.1?
  * Replays the gate body step by step (fixture amortized like the bench). */
object ProfCdc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name")
      r
    }

    // fixture build (amortized in bench: first access)
    val (path, idx) = time("versionedFixture build") {
      graft.queries.ExtraQueries.versionedFixture(spark, dir)
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val root = java.nio.file.Files.createTempDirectory("graft-profcdc").toString
      val downstream = s"$root/replica"
      time("seed write (asOf 1)") {
        ChangeFeed.asOf(spark, path, idx, 1L)
          .write.partitionBy("priority").parquet(downstream)
      }
      val ch1 = time("between(1,2)") {
        ChangeFeed.between(spark, path, idx, 1L, 2L, Seq("order_id"), "priority")
          .localCheckpoint()
      }
      time("apply hop 1") {
        ChangeFeed.applyChanges(ch1, downstream, Seq("order_id"), "priority")
      }
      val ch2 = time("between(2,3)") {
        ChangeFeed.between(spark, path, idx, 2L, 3L, Seq("order_id"), "priority")
          .localCheckpoint()
      }
      time("apply hop 2") {
        ChangeFeed.applyChanges(ch2, downstream, Seq("order_id"), "priority")
      }
      time("final agg") {
        spark.read.parquet(downstream)
          .groupBy(col("priority"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("price") * 100).cast("long")).as("cents"))
          .collect()
      }
      val seedFiles = new java.io.File(downstream).listFiles()
      println(s"  replica partition dirs: ${Option(seedFiles).map(_.count(_.isDirectory)).getOrElse(0)}")
      time("cleanup") {
        import scala.jdk.CollectionConverters._
        val walked = java.nio.file.Files.walk(java.nio.file.Path.of(root))
        try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walked.close()
      }
    }
    spark.stop()
  }
}
