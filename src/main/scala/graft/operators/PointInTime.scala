package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: attach to each fact row the dimension version
  * that was valid at the fact's timestamp.
  *
  * The reference does this inside fact_orders.sql:44-56 (`order_date >=
  * effective_date AND (expiration_date IS NULL OR order_date <
  * expiration_date)`). In Spark this stays an EQUI-join on the natural key
  * with the interval predicate as a residual filter — Catalyst shuffles both
  * sides by the key (or broadcasts the dim), so cost is one shuffle, not a
  * range-join cross product. Versions-per-key is small by construction
  * (dims change slowly), so the residual filter touches few rows per key.
  *
  * At 100 TB: facts shuffle once on the key; if the dim fits per-executor
  * memory pass `broadcastDim = true` and the shuffle disappears entirely.
  */
object PointInTime {

  /** @param joinType "inner" drops facts with no valid version;
    *                  "left_outer" keeps them with null dim columns
    *                  (the reference's fact build is inner — fact_orders.sql). */
  def pitJoin(facts: DataFrame, dim: DataFrame,
              factKey: String, dimKey: String, factTs: String,
              effCol: String = "effective_ts", expCol: String = "expiration_ts",
              broadcastDim: Boolean = false, joinType: String = "inner"): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    val cond: Column =
      facts(factKey) === d(dimKey) &&
      facts(factTs) >= d(effCol) &&
      (d(expCol).isNull || facts(factTs) < d(expCol))
    facts.join(d, cond, joinType)
  }
}
