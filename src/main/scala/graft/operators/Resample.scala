package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key grid (epoch-second buckets), with gap rows materialized and
  * missing values repaired by forward fill and/or bounded linear
  * interpolation — the feature-engineering shape (activity series,
  * sensor downsampling, training-curve alignment) the raw event table
  * can't serve directly.
  *
  * Determinism contract (the oracle depends on it): buckets are pure
  * epoch arithmetic — `floor(unix_micros / (step·10⁶)) · step` — no
  * calendar/timezone logic; per-bucket values are `round(sum, 6)`;
  * repair math is the same IEEE expression tree any engine computes.
  * Nothing here ties to a session timezone.
  *
  * Scale shape: one keyed aggregation (map-side partial) shrinks events
  * to (key × bucket); the grid EXPLODES from a per-key (min, max) pair —
  * grid size is the answer's own size, never a shuffle of raw events;
  * repair is one window pass per direction over grid-sized data. A key
  * idle for years makes its own long grid — that is the requested
  * output, not an intermediate blow-up. */
object Resample {

  /** Per-key grid at `stepSeconds` from each key's first to last event:
    * `(key, bucket, n_events, total_value, filled_value, interp_value)`
    * where `bucket` is the epoch-second bucket start, `total_value` the
    * rounded in-bucket sum (null on gap rows), `filled_value` carries
    * the last observed value forward, and `interp_value` linearly
    * interpolates interior gaps (observed rows keep their own value;
    * the grid spans first→last observation, so every gap is interior
    * and both neighbors exist). */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    // exact while |unix_micros| < 2^53 (year ~2255): IEEE division of
    // exactly-representable operands floors correctly at boundaries
    val bucket = (floor(unix_micros(col(tsCol)) / stepUs) * stepSeconds)
      .cast("long")
    val b = df.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valCol)), 6).as("total_value"))

    val grid = b.groupBy(col(keyCol))
      .agg(min("bucket").as("_lo"), max("bucket").as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), lit(stepSeconds)))
          .as("bucket"))

    val past = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val joined = grid.join(b, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("total_value"))
    val obsBucket = when(col("total_value").isNotNull, col("bucket"))
    val repaired = joined
      .withColumn("_pv", last(col("total_value"), ignoreNulls = true).over(past))
      .withColumn("_pb", last(obsBucket, ignoreNulls = true).over(past))
      .withColumn("_nv", first(col("total_value"), ignoreNulls = true).over(future))
      .withColumn("_nb", first(obsBucket, ignoreNulls = true).over(future))
    // interp on interior gaps: prev + (next - prev) * elapsed-fraction —
    // written as one expression tree so any engine reproduces it bit-wise
    val interp = when(col("total_value").isNotNull, col("total_value"))
      .otherwise(col("_pv") + (col("_nv") - col("_pv")) *
        ((col("bucket") - col("_pb")).cast("double") /
          (col("_nb") - col("_pb")).cast("double")))
    repaired.select(col(keyCol), col("bucket"), col("n_events"),
      col("total_value"),
      col("_pv").as("filled_value"),
      interp.as("interp_value"))
  }
}
