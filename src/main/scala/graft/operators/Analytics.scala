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

  /** [[topKPerGroup]] as ONE hash aggregate ([[graft.functions.TopKRows]]):
    * per-task k-bounded heaps combine map-side, partial heaps merge in the
    * reduce — the window formulation sorts EVERY group member through the
    * shuffle, this moves at most k rows per (group, task). Same output,
    * same semantics (`orderCol` DESC, `tieBreak` ASC, rank 1..k):
    * "metric DESC, id ASC" rides the heap's natural struct order as
    * `(orderCol, -tieBreak)`, so `tieBreak` must be a NON-NULL,
    * non-NaN numeric (an id column, its natural use) — a null/NaN
    * tie-break would place differently here (null smallest under struct
    * order) than under the window's asc-nulls-first, and the identity
    * contract is only claimed for clean keys.
    * The identity to the window path is pinned in AnalyticsSpec and by
    * the gate, whose oracle is `q_topk_group`'s SQL verbatim.
    *
    * `ascending = true` flips the measure's direction (`orderCol` ASC —
    * the distance-shaped ANN shortlists) by inverting it the same way the
    * tie-break is inverted; the tie-break stays ASC in both modes. */
  def topKPerGroupAgg(df: DataFrame, groupCols: Seq[String], orderCol: String,
                      tieBreak: String, k: Int,
                      ascending: Boolean = false): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    // ASC-under-DESC inversion: integral tie-breaks invert with bitwise NOT
    // (~x = -x-1, total and order-reversing at every value incl. MinValue,
    // where `* -1` wraps in non-ANSI and throws in ANSI — the TopKRewrite
    // convention); fractional ones keep negation (no overflow to dodge)
    import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, DecimalType,
      IntegerType, LongType, ShortType}
    def inverted(c: String): Column = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        bitwise_not(col(c).cast("long"))
      case FloatType | DoubleType | _: DecimalType => col(c) * lit(-1)
      case other => throw new IllegalArgumentException(
        s"topKPerGroupAgg: column '$c' has non-numeric type ${other.simpleString} — " +
          "inversion would silently yield nulls and misorder; use a numeric " +
          "key or the window path (topKPerGroup)")
    }
    val orderKey = if (ascending) inverted(orderCol) else col(orderCol)
    val sortKey = struct(orderKey.as("_o"),
      inverted(tieBreak).as("_t"), payload.as("_p"))
    val agg = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.TopKRows(
        org.apache.spark.sql.graft.Bridge.expression(sortKey), k)
        .toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("_top"))
      .select(posexplode(col("_top")).as(Seq("_pos", "_row")))
      .select(df.columns.map(c => col(s"_row._p.$c").as(c)) :+
        (col("_pos") + 1).cast("int").as("rank"): _*)
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

  /** CUBE over (year, priority): every subtotal combination in ONE
    * two-phase aggregation pass (4 grouping sets share the shuffle). */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .select(year(col("o_orderdate")).as("year"),
        col("o_orderpriority").as("priority"),
        (round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
      .cube(col("year"), col("priority"))
      .agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_orders"))

  /** GROUPING SETS beyond cube/rollup: exactly the requested lattice
    * points — ((year, priority), (year), ()) but NOT (priority) — in one
    * shared-shuffle pass, with grouping_id disambiguating a NULL group key
    * from an aggregated-away one. */
  def ordersGroupingSets(orders: DataFrame): DataFrame =
    orders
      .select(year(col("o_orderdate")).as("year"),
        col("o_orderpriority").as("priority"),
        (round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
      .groupingSets(
        Seq(Seq(col("year"), col("priority")), Seq(col("year")), Seq()),
        col("year"), col("priority"))
      .agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))

  /** Period-over-period: monthly revenue with previous-month delta and
    * ratio via lag(), PARTITIONED by year (January's prev is null) — a
    * global-order lag would funnel everything through one task; per-year
    * partitions keep the window distributed and the semantics honest
    * ("within-year month-over-month"). Money in cents (exact); the ratio
    * divides two exact BIGINTs raw (deterministic per SURVEY §4). */
  def monthlyDelta(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("yr")).orderBy(col("month"))
    orders
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
      .withColumn("yr", year(col("month")))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .withColumn("delta_cents", col("cents") - col("prev_cents"))
      .withColumn("mom_ratio", col("cents").cast("double") / col("prev_cents"))
      .drop("yr")
  }

  /** Spend quartiles WITHOUT a global-sort ntile (a single-task window at
    * scale): quartile boundaries come from one 3-value percentile
    * aggregate, broadcast back, and membership is a map-side CASE —
    * quartile 1 = top spenders. */
  def spendQuartiles(orders: DataFrame): DataFrame = {
    val spend = orders
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("spend_cents"))
    val bounds = spend.agg(
      expr("percentile(spend_cents, 0.25)").as("b1"),
      expr("percentile(spend_cents, 0.5)").as("b2"),
      expr("percentile(spend_cents, 0.75)").as("b3"))
    spend.crossJoin(broadcast(bounds))
      .withColumn("quartile",
        when(col("spend_cents") > col("b3"), 1)
          .when(col("spend_cents") > col("b2"), 2)
          .when(col("spend_cents") > col("b1"), 3)
          .otherwise(4))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend_cents")).as("quartile_cents"),
        min(col("spend_cents")).as("min_cents"),
        max(col("spend_cents")).as("max_cents"))
  }

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
