package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics on immutable storage.
  *
  * The reference leans on BigQuery `MERGE` (fact_orders.sql:59-77,
  * dim_*.sql) for idempotent re-runs. Parquet has no row-level UPDATE, so
  * Spark-first the same guarantee comes from latest-wins deduplication plus
  * (at write time) dynamic partition overwrite — re-running a day replaces
  * exactly that day's partition.
  *
  * One shuffle on the merge key; map-side nothing is wasted because the
  * window and the final projection pipeline in the same stage after the
  * exchange.
  */
object Upsert {

  /** Latest-wins merge of `updates` into `base` on `keys`: any key present in
    * `updates` takes the update row, others keep the base row. Row count ==
    * distinct keys of the union.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.selectExpr(cols: _*).withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_src").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_src", "_rn")
  }
}
