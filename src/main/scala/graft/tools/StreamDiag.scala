package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.queries.StarQueries
import graft.streaming.StreamOps

object StreamDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val sf = "/root/testdata/sf0.001"
    val events = StarQueries.events(spark, sf)
      .select($"user_id", $"ts", $"value").as[StreamOps.Event]
      .collect().toSeq.sortBy(_.ts.getTime)
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(StreamOps.Event(9999L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
    q.processAllAvailable()
    val streamed = spark.table("sd").where($"user_id" =!= 9999L)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    q.stop()
    val batch = Sessionize.sessionize(
        StarQueries.events(spark, sf), "user_id", "ts", "value", 30, "event_id")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    println(s"streamed=${streamed.size} batch=${batch.size}")
    println("stream-only: " + (streamed -- batch).toSeq.sortBy(x => (x._1, x._2.getTime)).take(10).mkString("; "))
    println("batch-only:  " + (batch -- streamed).toSeq.sortBy(x => (x._1, x._2.getTime)).take(10).mkString("; "))
    spark.stop()
  }
}
