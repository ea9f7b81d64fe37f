package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact table construction (reference sql/core/fact/fact_orders.sql).
  *
  * orders (header) ⋈ lineitem (lines) on the order key, then dimension
  * lookups to swap natural keys for surrogate keys, plus derived measures.
  *
  * Scale shape: orders⋈lineitem is the big join — both sides shuffle-hash on
  * l_orderkey (or co-locate for free if both are bucketed on the order key).
  * Dimension lookups are broadcasts: part/customer dims are orders of
  * magnitude smaller than the fact; `broadcast()` pins that so a 1000-node
  * cluster never shuffles the fact a second time.
  */
object FactBuild {

  /** Transactional-grain fact: one row per (order, line). */
  def factOrders(orders: DataFrame, lineitem: DataFrame,
                 dimCustomer: DataFrame, dimPart: DataFrame): DataFrame = {
    val header = orders.select(
      col("o_orderkey"), col("o_custkey"),
      to_date(col("o_orderdate")).as("order_date"),
      col("o_orderstatus"), col("o_totalprice"))
    val lines = lineitem.select(
      col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))

    header
      .join(lines, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(dimCustomer.where(col("is_current"))
              .select(col("customer_id"), col("customer_sk"))),
            col("o_custkey") === col("customer_id"))
      .join(broadcast(dimPart.where(col("is_current"))
              .select(col("part_id"), col("part_sk"))),
            col("l_partkey") === col("part_id"))
      .select(
        col("o_orderkey").as("order_id"),
        col("order_date"),
        col("customer_sk"),
        col("part_sk"),
        col("l_linenumber").as("line_number"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extended_price"),
        col("l_discount").as("discount"),
        // Raw IEEE product (no round): bitwise-deterministic per row; rounding
        // happens only at aggregation sites (SURVEY.md §4).
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_amount"),
        col("o_orderstatus").as("status"))
  }
}
