package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfDecon {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("lang_id")(spark, dir).write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("decontaminate")(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"decontaminate run $i: ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
