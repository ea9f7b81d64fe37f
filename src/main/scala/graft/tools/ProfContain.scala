package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.TextFunctions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.ShingleSet

/** Dev profiling: where does ngramContainment's time go at sf0.1? */
object ProfContain {
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

    time("warm docs")(docs.count())
    val sh = docs
      .withColumn("_sh", Bridge.column(ShingleSet(
        Bridge.expression(normWords(col("text"))), 3)))
      .where(size(col("_sh")) > 0)
      .select(col("doc_id"), col("_sh"))
      .localCheckpoint(false)
    time("sh checkpoint")(sh.count())
    val grams = sh.select(col("doc_id"), explode(col("_sh")).as("gram"))
    time("grams")(grams.count())
    val rare = grams.join(
      grams.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
        .where(col("_df") <= 10)
        .select(col("gram")),
      Seq("gram"))
    time("rare")(rare.count())
    val cand = rare.select(col("gram"), col("doc_id").as("i"))
      .join(rare.select(col("gram"), col("doc_id").as("j")), Seq("gram"))
      .where(col("i") < col("j"))
      .select("i", "j").distinct()
    val candCk = cand.localCheckpoint(false)
    time("cand")(candCk.count())
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    val res = candCk
      .join(sh.select(col("doc_id").as("i"), col("_sh").as("sh_i")), "i")
      .join(sh.select(col("doc_id").as("j"), col("_sh").as("sh_j")), "j")
      .withColumn("containment_i", inter.cast("double") / size(col("sh_i")))
      .withColumn("containment_j", inter.cast("double") / size(col("sh_j")))
      .where(greatest(col("containment_i"), col("containment_j")) >= 0.8)
    time("rescore")(res.count())
    time("full op steady 1")(Dedup.ngramContainment(docs, "doc_id", "text", 0.8, 10).count())
    time("full op steady 2")(Dedup.ngramContainment(docs, "doc_id", "text", 0.8, 10).count())
    // variant: intersect computed ONCE behind a checkpoint barrier
    val once = candCk
      .join(sh.select(col("doc_id").as("i"), col("_sh").as("sh_i")), "i")
      .join(sh.select(col("doc_id").as("j"), col("_sh").as("sh_j")), "j")
      .select(col("i"), col("j"),
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("double").as("_inter"),
        size(col("sh_i")).as("_ni"), size(col("sh_j")).as("_nj"))
      .localCheckpoint(false)
      .withColumn("containment_i", col("_inter") / col("_ni"))
      .withColumn("containment_j", col("_inter") / col("_nj"))
      .where(greatest(col("containment_i"), col("containment_j")) >= 0.8)
    time("rescore once-barrier")(once.count())
    // variant: single intersect in the condition via inter >= t*min(ni,nj)
    val cond = candCk
      .join(sh.select(col("doc_id").as("i"), col("_sh").as("sh_i")), "i")
      .join(sh.select(col("doc_id").as("j"), col("_sh").as("sh_j")), "j")
      .where(size(array_intersect(col("sh_i"), col("sh_j"))).cast("double")
        >= lit(0.8) * least(size(col("sh_i")), size(col("sh_j"))))
      .select(col("i"), col("j"),
        (size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
          size(col("sh_i"))).as("containment_i"),
        (size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
          size(col("sh_j"))).as("containment_j"))
    time("rescore cond-rewrite")(cond.count())
    val df = Dedup.ngramContainment(docs, "doc_id", "text", 0.8, 10)
    df.count()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort ") ||
        l.contains("Aggregate") || l.contains("Window"))
      .map(_.take(140)).mkString("\n"))
    spark.stop()
  }
}
