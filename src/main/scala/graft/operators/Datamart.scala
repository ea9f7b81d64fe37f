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

  /** Customer-level RFM analytics (customer_analytics.sql). `anchorDate`
    * replaces the reference's CURRENT_DATE for determinism — pass the max
    * order date (or the pipeline's execution date).
    */
  def customerAnalytics(fact: DataFrame, dimCustomer: DataFrame, anchorDate: String): DataFrame = {
    val anchor = lit(anchorDate).cast("date")
    val perCustomer = fact
      .join(broadcast(dimCustomer.where(col("is_current"))
              .select(col("customer_sk"), col("customer_id"), col("name"), col("mkt_segment"))),
            Seq("customer_sk"))
      .groupBy(col("customer_id"), col("name"), col("mkt_segment"))
      .agg(
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"),
        datediff(anchor, max(col("order_date"))).as("days_since_last_order"),
        countDistinct(col("order_id")).as("total_orders"),
        round(sum(col("net_amount")), 6).as("total_lifetime_value"))
    perCustomer
      .withColumn("average_order_value",
        col("total_lifetime_value") / col("total_orders"))
      .withColumn("customer_segment", rfmSegment(
        col("days_since_last_order"), col("total_orders"), col("total_lifetime_value")))
  }

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
