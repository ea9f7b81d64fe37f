package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch). Streaming twin:
  * [[graft.streaming.StreamOps.sessionize]].
  *
  * Two windows over the same (key, ts) partitioning → ONE shuffle total:
  * Catalyst reuses the exchange because both windows share partition/order.
  * Gap comparison is on exact µs longs (`unix_micros`), not timestamps, so
  * the session boundaries are bit-deterministic across engines.
  */
object Sessionize {

  /** @param gapMinutes new session when the gap to the previous event exceeds this */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gapMinutes: Int, tieBreak: String): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val flagged = events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev_us", lag(col("_us"), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull || col("_us") - col("_prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(w))
    flagged
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 6).as("total_value"))
  }
}
