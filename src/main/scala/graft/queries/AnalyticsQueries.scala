package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Analytics operator queries + DuckDB oracles (SURVEY.md §2 #12-18). */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def brandRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("l_partkey").as("part_id"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"))

  def topkGroup(s: SparkSession, dir: String): DataFrame =
    Analytics.topKPerGroup(brandRevenue(s, dir), Seq("brand"), "revenue", "part_id", 3)
      .orderBy("brand", "rank")

  /** The heap-aggregate twin of [[topkGroup]] — same rows, same ranks, so
    * the oracle is `q_topk_group`'s SQL verbatim; what the gate proves is
    * that the k-bounded partial-heap aggregate reproduces the window
    * semantics exactly (ties included). */
  def topkGroupAgg(s: SparkSession, dir: String): DataFrame =
    Analytics.topKPerGroupAgg(brandRevenue(s, dir), Seq("brand"), "revenue", "part_id", 3)
      .orderBy("brand", "rank")

  /** The OPTIMIZER-REWRITE path end-to-end at the gate: the [[topkGroup]]
    * window idiom verbatim, optimized under `spark.graft.rewrite.topk=
    * true` so [[graft.plans.TopKRewrite]] replaces the window with the
    * bounded-heap aggregate. The plan is forced (and memoized by the
    * QueryExecution) inside the flag window, then the flag is restored —
    * other gate queries never see it. Fails loudly if the rewrite did
    * not fire; oracle is `q_topk_group`'s SQL verbatim. */
  def topkRewrite(s: SparkSession, dir: String): DataFrame = {
    val key = "spark.graft.rewrite.topk"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      // the rule only inverts NON-NULLABLE integral ascending tie-breaks
      // (nullable asc-nulls-first is inexpressible by value inversion), and
      // parquet-sourced l_partkey is nullable by schema — coalesce makes
      // the tie-break attribute non-nullable without changing any value
      // (the inner join guarantees no nulls reach it)
      val rev = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          coalesce(col("l_partkey"), lit(-1L)).as("part_id"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"))
      val df = Analytics.topKPerGroup(rev, Seq("brand"), "revenue", "part_id", 3)
        .orderBy("brand", "rank")
      val plan = df.queryExecution.optimizedPlan.toString
      require(plan.contains("graft_topk"),
        s"q_topk_rewrite: TopKRewrite did not fire:\n$plan")
      df
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  def windowRunning(s: SparkSession, dir: String): DataFrame =
    Analytics.runningOrderStats(t(s, dir, "orders"))
      .orderBy("o_custkey", "order_date", "o_orderkey")

  def rollup(s: SparkSession, dir: String): DataFrame =
    Analytics.salesRollup(t(s, dir, "lineitem"), t(s, dir, "orders"), t(s, dir, "part"))
      .orderBy(asc_nulls_first("year"), asc_nulls_first("category"))

  def pivot(s: SparkSession, dir: String): DataFrame =
    Analytics.statusPivot(t(s, dir, "orders"), Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  def percentiles(s: SparkSession, dir: String): DataFrame =
    Analytics.percentiles(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy("l_returnflag")

  def semiAnti(s: SparkSession, dir: String): DataFrame =
    Analytics.semiAntiCounts(t(s, dir, "customer"), t(s, dir, "orders"))
      .orderBy("mkt_segment")

  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionize(StarQueries.events(s, dir), "user_id", "ts", "value",
        gapMinutes = 30, tieBreak = "event_id")
      .orderBy("user_id", "session_seq")

  def cube(s: SparkSession, dir: String): DataFrame =
    Analytics.ordersCube(t(s, dir, "orders"))
      .orderBy(asc_nulls_first("year"), asc_nulls_first("priority"))

  def groupingSets(s: SparkSession, dir: String): DataFrame =
    Analytics.ordersGroupingSets(t(s, dir, "orders"))
      .orderBy(col("gid"), asc_nulls_first("year"), asc_nulls_first("priority"))

  def monthlyDelta(s: SparkSession, dir: String): DataFrame =
    Analytics.monthlyDelta(t(s, dir, "orders"))
      .orderBy("month")

  def spendQuartiles(s: SparkSession, dir: String): DataFrame =
    Analytics.spendQuartiles(t(s, dir, "orders"))
      .orderBy("quartile")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_group" -> (topkGroup _),
    "q_topk_agg" -> (topkGroupAgg _),
    "q_topk_rewrite" -> (topkRewrite _),
    "q_window_running" -> (windowRunning _),
    "q_rollup" -> (rollup _),
    "q_pivot" -> (pivot _),
    "q_percentiles" -> (percentiles _),
    "q_semi_anti" -> (semiAnti _),
    "q_sessionize" -> (sessionize _),
    "q_cube" -> (cube _),
    "q_grouping_sets" -> (groupingSets _),
    "q_monthly_delta" -> (monthlyDelta _),
    "q_spend_quartiles" -> (spendQuartiles _)
  )

  private lazy val topkOracle: String =
      """WITH rev AS (
        |  SELECT p.p_brand AS brand, l.l_partkey AS part_id,
        |         round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS revenue
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2)
        |SELECT brand, part_id, revenue,
        |       CAST(row_number() OVER (PARTITION BY brand ORDER BY revenue DESC, part_id) AS INT) AS rank
        |FROM rev QUALIFY rank <= 3
        |ORDER BY brand, rank""".stripMargin

  val oracle: Map[String, String] = Map(
    // the heap-aggregate path must reproduce the window path bit for bit —
    // one oracle serves both
    "q_topk_agg" -> topkOracle,
    "q_topk_group" -> topkOracle,
    "q_topk_rewrite" -> topkOracle,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS running_cents,
        |  CAST(row_number() OVER w AS INT) AS order_seq,
        |  avg(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w3 AS avg3_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |       w3 AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS year, p.p_type AS category,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS total_sales,
        |  count(*) AS n_rows
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY ROLLUP(1, 2)
        |ORDER BY year ASC NULLS FIRST, category ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
        |  min(l_extendedprice) AS min_v, max(l_extendedprice) AS max_v,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q_cube" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS year, o_orderpriority AS priority,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE(1, 2)
        |ORDER BY year NULLS FIRST, priority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT year, priority,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  count(*) AS n_orders,
        |  CAST(grouping(year, priority) AS BIGINT) AS gid
        |FROM (SELECT CAST(year(o_orderdate) AS INT) AS year,
        |        o_orderpriority AS priority,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders)
        |GROUP BY GROUPING SETS ((year, priority), (year), ())
        |ORDER BY gid, year NULLS FIRST, priority NULLS FIRST""".stripMargin,

    "q_monthly_delta" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT month, cents,
        |  lag(cents) OVER w AS prev_cents,
        |  cents - lag(cents) OVER w AS delta_cents,
        |  CAST(cents AS DOUBLE) / lag(cents) OVER w AS mom_ratio
        |FROM m
        |WINDOW w AS (PARTITION BY year(month) ORDER BY month)
        |ORDER BY month""".stripMargin,

    "q_spend_quartiles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT quantile_cont(spend_cents, 0.25) AS b1,
        |  quantile_cont(spend_cents, 0.5) AS b2,
        |  quantile_cont(spend_cents, 0.75) AS b3 FROM spend)
        |SELECT CASE WHEN spend_cents > b3 THEN 1
        |            WHEN spend_cents > b2 THEN 2
        |            WHEN spend_cents > b1 THEN 3
        |            ELSE 4 END AS quartile,
        |  count(*) AS n_customers,
        |  CAST(sum(spend_cents) AS BIGINT) AS quartile_cents,
        |  min(spend_cents) AS min_cents, max(spend_cents) AS max_cents
        |FROM spend CROSS JOIN bounds
        |GROUP BY 1 ORDER BY quartile""".stripMargin,

    "q_semi_anti" ->
      """WITH w AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT c.c_mktsegment AS mkt_segment,
        |  count(*) AS n_customers,
        |  count(w.o_custkey) AS n_with_orders,
        |  count(*) - count(w.o_custkey) AS n_without_orders
        |FROM customer c LEFT JOIN w ON c.c_custkey = w.o_custkey
        |GROUP BY 1 ORDER BY mkt_segment""".stripMargin,

    "q_sessionize" ->
      """WITH ev AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 6) AS total_value
        |FROM sessions GROUP BY 1, 2
        |ORDER BY user_id, session_seq""".stripMargin
  )
}
