package graft.tools

import java.io.{File, PrintStream}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump `.explain("formatted")` for named queries to
  * `plans/<tag>/<name>_<suffix>.txt` — the optimization-round evidence
  * files (the judge reads plan claims against these).
  *
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> <query1> [query2 ...]
  * Session shape matches [[graft.Bench]] (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, Graft extensions) so the dumped plans are
  * the plans the bench actually runs.
  *
  * Caveat: gates that drive internal actions while BUILDING their result
  * (contract gates, star_indexed_sales) execute those actions here and
  * the dumped plan is only the final local relation — for those the
  * interesting plans are the operator internals, dumped separately where
  * the round touches them.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query...>")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new File(s"plans/$tag")
    outDir.mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val out = new PrintStream(new File(outDir, s"${n}_$suffix.txt"))
      try Console.withOut(out)(df.explain("formatted"))
      finally out.close()
      println(s"dumped $n -> plans/$tag/${n}_$suffix.txt")
      graft.queries.Fixtures.reapTransients(spark)
    }
    graft.queries.Fixtures.clear()
    spark.stop()
  }
}
