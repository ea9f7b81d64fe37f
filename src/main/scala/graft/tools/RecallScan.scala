package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic: per-query recall@K of each ANN gate vs the
  * exact brute-force top-K, per scale factor — floor calibration. */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.SimilarityQueries._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val exact = all("ann_topk")(spark, dir).select("q_id", "vec_id")
        .localCheckpoint()
      for (name <- Seq("ann_ivf", "ann_ivf_probe", "ann_pq", "ann_pq_probe",
          "ann_ivfpq", "ann_ivfpq_probe", "ann_opq", "ann_opq_probe",
          "ann_pca_probe")) {
        val row = all(name)(spark, dir).select("q_id", "vec_id")
          .join(exact, Seq("q_id", "vec_id"))
          .groupBy("q_id").count()
          .agg(min(col("count")).cast("double") / K,
               sum(col("count")).cast("double") / (K * QueryCount))
          .collect().head
        println(f"RECALL $sf $name minPerQ=${row.getDouble(0)}%.3f mean=${row.getDouble(1)}%.3f")
      }
    }
    spark.stop()
  }
}
