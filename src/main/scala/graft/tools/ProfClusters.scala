package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, FuzzyJoin}

/** Dev profiling: A/B the clustersFromEdges convergence-check formulations
  * (join-based changed-count vs ride-along `_old` filter-count) in ONE JVM,
  * alternating reps, on the q_entity_resolution edge set at sf0.1. */
object ProfClusters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val c = graft.Tables.load(spark, dir, "customer")
      .where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"))
    val edges = FuzzyJoin.selfJoin(c, "c_custkey", "c_name", maxDist = 1)
      .select(col("a_id").as("i"), col("b_id").as("j"))
      .localCheckpoint()
    println(s"edges: ${edges.count()}")

    def oldForm(docs: DataFrame, edgesIn: DataFrame, idCol: String): DataFrame = {
      def cp(df: DataFrame): DataFrame = df.localCheckpoint()
      val e = cp(edgesIn.select(col("i"), col("j")))
      val adj = cp(e.union(e.select(col("j").as("i"), col("i").as("j"))))
      var labels = cp(adj.select(col("i").as("node")).distinct()
        .withColumn("lbl", col("node")))
      var converged = false
      var iter = 0
      while (!converged && iter < 30) {
        val neighborMin = adj
          .join(labels.withColumnRenamed("node", "j").withColumnRenamed("lbl", "nlbl"),
                Seq("j"))
          .groupBy(col("i").as("node")).agg(min(col("nlbl")).as("nmin"))
        val stepped = labels.join(neighborMin, Seq("node"), "left_outer")
          .select(col("node"), least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        val next = cp(stepped
          .join(labels.select(col("node").as("lbl"), col("lbl").as("lbl2")),
                Seq("lbl"), "left_outer")
          .select(col("node"), least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl")))
        val changed = next.join(labels.withColumnRenamed("lbl", "old"), Seq("node"))
          .where(col("lbl") =!= col("old")).count()
        labels = next
        converged = changed == 0
        iter += 1
      }
      println(s"  old iters=$iter")
      docs.select(col(idCol))
        .join(labels.withColumnRenamed("node", idCol), Seq(idCol), "left_outer")
        .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster_id"))
        .withColumn("is_canonical", col(idCol) === col("cluster_id"))
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name ($n rows)")
    }
    (1 to 3).foreach { rep =>
      time(s"old rep$rep")(oldForm(c, edges, "c_custkey").count())
      time(s"new rep$rep")(Dedup.clustersFromEdges(c, edges, "c_custkey").count())
    }
    spark.stop()
  }
}
