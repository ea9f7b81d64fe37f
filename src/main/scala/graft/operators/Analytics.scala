package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics operators: the query surface a datamart consumer
  * expects beyond the reference's two canned reports.
  *
  * All shapes here are single-shuffle (group-by or window on one key) and
  * whole-stage-codegen friendly — no UDFs, no driver-side iteration.
  */
object Analytics {

  /** Top-k rows per group by a (pre-rounded, hence cross-engine-stable)
    * measure, deterministic tie-break. row_number inside one window =
    * one shuffle on the group key; never a global sort.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   tieBreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak))
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact-integer running window: money as cents (BIGINT) so running sums
    * are exact regardless of the engine's window-aggregation tree shape.
    * (A double running sum differs between Spark's sequential frames and
    *  DuckDB's segment trees in the low bits — cents don't.)
    */
  def runningOrderStats(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_date"), col("o_orderkey"))
    val w3 = w.rowsBetween(-2, 0)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        round(col("o_totalprice") * 100).cast("bigint").as("total_cents"))
      .withColumn("running_cents", sum(col("total_cents")).over(w))
      .withColumn("order_seq", row_number().over(w))
      .withColumn("avg3_cents", avg(col("total_cents")).over(w3))
  }

  /** Multi-level ROLLUP aggregate (year × category subtotals + grand total). */
  def salesRollup(lineitem: DataFrame, orders: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(orders.select(col("o_orderkey"), year(col("o_orderdate")).as("year")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type").as("category"))),
            col("l_partkey") === col("p_partkey"))
      .rollup(col("year"), col("category"))
      .agg(
        // round(4), not (6): the grand-total level sums the whole table
        // (~1e9 at sf0.1) — keep the rounding boundary ≫ reorder noise
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("total_sales"),
        count(lit(1)).as("n_rows"))

  /** Pivot: order counts by priority × status (fixed value list keeps the
    * plan static — no extra values-discovery job at 100 TB). */
  def statusPivot(orders: DataFrame, statuses: Seq[String]): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .count()
      .na.fill(0)

  /** Exact interpolated percentiles of a measure per group. */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
                  ps: Seq[Double]): DataFrame = {
    val aggs = ps.map(p =>
      round(expr(s"percentile($valueCol, $p)"), 6).as(s"p${(p * 100).toInt}")) ++
      Seq(min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"),
          count(lit(1)).as("n"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Semi/anti join demo: per-segment counts of customers with and without
    * orders. The semi/anti joins shuffle on the key once; `orders` is
    * aggregated to distinct keys map-side before the join.
    */
  def semiAntiCounts(customer: DataFrame, orders: DataFrame): DataFrame = {
    val withOrders = customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
    val totals = customer.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
    totals
      .join(withOrders, Seq("c_mktsegment"), "left_outer")
      .join(withoutOrders, Seq("c_mktsegment"), "left_outer")
      .na.fill(0, Seq("n_with_orders", "n_without_orders"))
      .withColumnRenamed("c_mktsegment", "mkt_segment")
  }
}
