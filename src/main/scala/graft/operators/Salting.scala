package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation.
  *
  * A plain `groupBy(k).agg(...)` shuffles every row of a hot key to one
  * reducer. Salting splits each key into `saltBuckets` sub-keys (salt from a
  * hash of a high-cardinality column, NOT rand() — determinism), partially
  * aggregates per (key, salt) map-side, then combines the tiny partial set.
  * Result is identical to the unsalted aggregate; the hot key's work spreads
  * over `saltBuckets` reducers.
  *
  * Spark's own partial aggregation handles mild skew already; salting is for
  * the pathological case (one key ≫ a single executor's share) where the
  * FINAL aggregation of a two-phase count-distinct or a high-cardinality
  * intermediate still lands on one task. At 100 TB this is the difference
  * between a straggler-free job and a 10× tail.
  */
object Salting {

  /** sum/count aggregates over `valueCol` grouped by `keyCols`, salted. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                saltFrom: String, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n_rows"))
  }
}
