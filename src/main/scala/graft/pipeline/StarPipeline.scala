package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._
import graft.sources.RawLayer

/** The reference's three DAGs (ingest_raw → process_core → process_datamart,
  * /root/reference/dags/) as one graft DAG over parquet layers.
  *
  * Layer layout under `warehouse/`:
  *   core/dim_customers, core/dim_parts, core/dim_dates, core/fact_orders
  *   datamart/sales_summary, datamart/customer_analytics
  *
  * Each task reads the previous layer from disk (not a lineage handoff) so
  * any subset can re-run idempotently — the property the reference gets
  * from per-day MERGE + WRITE_APPEND, here from whole/partition overwrite.
  */
object StarPipeline {

  def tasks(spark: SparkSession, srcDir: String, warehouse: String): Seq[Dag.Task] = {
    def t(name: String) = Tables.load(spark, srcDir, name)
    def read(layer: String) = spark.read.parquet(s"$warehouse/$layer")
    def write(df: DataFrame, layer: String): Unit =
      RawLayer.truncateWrite(df, s"$warehouse/$layer")

    val dimCustomers = Dag.Task("core.dim_customers")(() =>
      write(Scd2.snapshotDim(
        t("customer").select(
          col("c_custkey").as("customer_id"), col("c_name").as("name"),
          col("c_nationkey").as("nation_key"), col("c_acctbal").as("acct_bal"),
          col("c_mktsegment").as("mkt_segment")),
        "customer_id", "customer_sk"), "core/dim_customers"))

    val dimParts = Dag.Task("core.dim_parts")(() =>
      write(Scd2.snapshotDim(
        t("part").select(
          col("p_partkey").as("part_id"), col("p_name").as("name"),
          col("p_brand").as("brand"), col("p_type").as("category"),
          col("p_size").as("size"), col("p_retailprice").as("retail_price")),
        "part_id", "part_sk"), "core/dim_parts"))

    val dimDates = Dag.Task("core.dim_dates")(() =>
      write(DateDim.fromTableSpan(t("orders"), "o_orderdate"), "core/dim_dates"))

    val factOrders = Dag.Task("core.fact_orders",
        deps = Seq("core.dim_customers", "core.dim_parts", "core.dim_dates"))(() =>
      write(FactBuild.factOrders(
        t("orders"), t("lineitem"), read("core/dim_customers"), read("core/dim_parts")),
        "core/fact_orders"))

    val salesSummary = Dag.Task("datamart.sales_summary",
        deps = Seq("core.fact_orders"))(() =>
      write(Datamart.salesSummary(
        read("core/fact_orders"), read("core/dim_parts"), read("core/dim_dates")),
        "datamart/sales_summary"))

    val customerAnalytics = Dag.Task("datamart.customer_analytics",
        deps = Seq("core.fact_orders"))(() =>
      write(Datamart.customerAnalytics(
        read("core/fact_orders"), read("core/dim_customers"),
        Datamart.anchorOf(t("orders"), "o_orderdate")),
        "datamart/customer_analytics"))

    Seq(dimCustomers, dimParts, dimDates, factOrders, salesSummary, customerAnalytics)
  }

  def run(spark: SparkSession, srcDir: String, warehouse: String): Dag.Report =
    Dag.run(tasks(spark, srcDir, warehouse))
}
