package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Dev profiling: q_fuzzy_join cost split at sf0.1 — variant explode vs
  * candidate join vs rescore vs distinct; plus a checkpoint-shared-legs
  * variant. */
object ProfFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val c = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2fs  $name ($n rows)")
    }

    time("warm")(c.count())
    val keys = c.select(col("c_custkey").as("_a_id"), col("c_name").as("_a_s"))
      .where(col("_a_s").isNotNull)
      .select(col("_a_id"), col("_a_s"),
        explode(FuzzyJoin.deletionVariants(col("_a_s"), 1)).as("_v"))
    time("variants explode only")(keys.count())
    (1 to 2).foreach { rep =>
      time(s"current selfJoin rep$rep")(
        FuzzyJoin.selfJoin(c, "c_custkey", "c_name", 1).count())
      // shared-leg variant: explode once, checkpoint, join blocks
      val ck = keys.localCheckpoint(false)
      val other = ck.withColumnsRenamed(Map("_a_id" -> "_b_id", "_a_s" -> "_b_s"))
      val out = ck.join(other, "_v").where(col("_a_id") < col("_b_id"))
        .withColumn("dist", levenshtein(col("_a_s"), col("_b_s"), 1))
        .where(col("dist") >= 0)
        .select(col("_a_id").as("a_id"), col("_b_id").as("b_id"), col("dist"))
        .distinct()
      time(s"ckpt-shared selfJoin rep$rep")(out.count())
      // candidate-occurrence count (how many levenshtein evals?)
      if (rep == 1) {
        val cand = ck.join(other, "_v").where(col("_a_id") < col("_b_id"))
        time("candidate occurrences")(cand.count())
      }
    }
    spark.stop()
  }
}
