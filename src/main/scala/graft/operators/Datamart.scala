package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Datamart-layer aggregations (reference sql/datamart/sales/).
  *
  * Both are single-shuffle group-bys over the fact: Spark computes partial
  * aggregates map-side, so at 100 TB the shuffle carries one row per
  * (group × task), not per fact row. `count(DISTINCT order_id)` expands to a
  * two-phase aggregate under AQE; it stays keyed on the same grouping so no
  * extra fact-wide shuffle.
  */
object Datamart {

  /** Daily sales by product category (sales_summary.sql): calendar attrs come
    * from the date dim (broadcast — it is thousands of rows). */
  def salesSummary(fact: DataFrame, dimPart: DataFrame, dimDates: DataFrame): DataFrame = {
    fact
      .join(broadcast(dimPart.where(col("is_current"))
              .select(col("part_sk"), col("category"))), Seq("part_sk"))
      .join(broadcast(dimDates.select(
              col("full_date"), col("year"), col("month"), col("month_name"))),
            col("order_date") === col("full_date"))
      .groupBy(col("order_date").as("date"), col("year"), col("month"),
               col("month_name"), col("category").as("product_category"))
      .agg(
        round(sum(col("net_amount")), 6).as("total_sales"),
        countDistinct(col("order_id")).as("total_orders"),
        // quantities are small integral doubles: exact sum, no round needed
        sum(col("quantity")).as("total_quantity"),
        // Divide the ROUNDED sum (cross-engine-stable) and emit the raw IEEE
        // quotient — an outer round would re-amplify reorder noise at the
        // rounding boundary (SURVEY.md §4).
        (round(sum(col("net_amount")), 6) / countDistinct(col("order_id"))).as("avg_order_value"))
  }

  /** Customer-level RFM analytics (customer_analytics.sql). The anchor date
    * replaces the reference's CURRENT_DATE for determinism — pass the
    * pipeline's execution date, or derive it in-plan with [[anchorOf]].
    */
  def customerAnalytics(fact: DataFrame, dimCustomer: DataFrame, anchorDate: String): DataFrame =
    customerAnalytics(fact, dimCustomer,
      fact.sparkSession.range(1).select(lit(anchorDate).cast("date").as("anchor_date")))

  /** 1-row anchor relation: `max(dateCol)` of `table`, for deriving the RFM
    * anchor in-plan (no driver-side `.head()` job — the extra full scan and
    * the collect barrier both disappear; the 1-row side is broadcast).
    */
  def anchorOf(table: DataFrame, dateCol: String): DataFrame =
    table.agg(max(to_date(col(dateCol))).as("anchor_date"))

  /** In-plan variant: `anchor` is any 1-row relation with a DATE column
    * `anchor_date` (see [[anchorOf]]). It joins AFTER the per-customer
    * aggregate — a broadcast of 1 row against |customers| rows, so the fact
    * table itself is never widened by the cross join.
    */
  def customerAnalytics(fact: DataFrame, dimCustomer: DataFrame, anchor: DataFrame): DataFrame = {
    val perCustomer = fact
      .join(broadcast(dimCustomer.where(col("is_current"))
              .select(col("customer_sk"), col("customer_id"), col("name"), col("mkt_segment"))),
            Seq("customer_sk"))
      .groupBy(col("customer_id"), col("name"), col("mkt_segment"))
      .agg(
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"),
        countDistinct(col("order_id")).as("total_orders"),
        round(sum(col("net_amount")), 6).as("total_lifetime_value"))
    finishAnalytics(perCustomer, anchor)
  }

  /** The derivation tail of [[customerAnalytics]] — anchor recency, AOV,
    * and RFM segment over a per-customer aggregate relation with columns
    * `(customer_id, name, mkt_segment, first_order_date, last_order_date,
    * total_orders, total_lifetime_value)`. Shared with
    * [[DatamartIncr.customerAnalyticsFromState]], whose per-customer rows
    * come from merged incremental state instead of a fact scan — ONE
    * definition of the output contract, two ways to arrive at it. */
  private[operators] def finishAnalytics(perCustomer: DataFrame,
                                         anchor: DataFrame): DataFrame =
    perCustomer
      .crossJoin(broadcast(anchor))
      .withColumn("days_since_last_order",
        datediff(col("anchor_date"), col("last_order_date")))
      .drop("anchor_date")
      .withColumn("average_order_value",
        col("total_lifetime_value") / col("total_orders"))
      .withColumn("customer_segment", rfmSegment(
        col("days_since_last_order"), col("total_orders"), col("total_lifetime_value")))

  /** RFM CASE from customer_analytics.sql:66-72 (thresholds preserved). */
  private def rfmSegment(recencyDays: org.apache.spark.sql.Column,
                         frequency: org.apache.spark.sql.Column,
                         monetary: org.apache.spark.sql.Column) =
    when(recencyDays <= 30 && frequency >= 3 && monetary >= 500, "VIP")
      .when(recencyDays <= 90 && frequency >= 2, "Loyal")
      .when(recencyDays <= 180, "Active")
      .when(recencyDays <= 365, "At Risk")
      .otherwise("Inactive")
}
