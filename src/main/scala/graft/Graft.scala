package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** Convenience entry point: a SparkSession wired the way graft expects
  * (extensions registered, sane local defaults). On a cluster, start from
  * your own builder and add `.withExtensions(new GraftExtensions)` plus the
  * SCALING.md configuration.
  */
object Graft {
  def session(master: String = "local[*]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
