package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generated date dimension.
  *
  * Re-expresses the reference's `sql/core/dim/dim_dates.sql` (BigQuery
  * GENERATE_DATE_ARRAY + per-date attributes) as a declarative Spark plan:
  * `sequence(lo, hi, interval 1 day)` exploded, then pure column expressions
  * — no driver-side loop, no action, so Catalyst can inline it into any
  * consumer and the dimension is always broadcastable (a date dim spans
  * years, i.e. thousands of rows, regardless of fact size).
  */
object DateDim {

  /** Calendar attributes for a date column (reference dim_dates.sql:23-56). */
  def attributes(d: Column): Seq[(String, Column)] = Seq(
    "date_id" -> (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("int"),
    "full_date" -> d,
    "year" -> year(d),
    "quarter" -> quarter(d),
    "month" -> month(d),
    "month_name" -> date_format(d, "MMMM"),
    "week_of_year" -> weekofyear(d),
    "day_of_month" -> dayofmonth(d),
    "day_of_week" -> dayofweek(d), // 1 = Sunday … 7 = Saturday
    "day_name" -> date_format(d, "EEEE"),
    "is_weekend" -> dayofweek(d).isin(1, 7),
    "fiscal_year" -> when(month(d) >= 7, year(d)).otherwise(year(d) - 1), // FY starts Jul 1
    "holiday_name" -> when(date_format(d, "MM-dd") === "01-01", "New Year's Day")
      .when(date_format(d, "MM-dd") === "07-04", "Independence Day")
      .when(date_format(d, "MM-dd") === "12-25", "Christmas Day"),
    "is_holiday" -> date_format(d, "MM-dd").isin("01-01", "07-04", "12-25")
  )

  /** Date dimension spanning [min(dateCol), max(dateCol)] of `driving`.
    *
    * The bounds stay inside the plan (1-row agg cross-joined into the
    * sequence) — no collect, works unchanged on a 100 TB fact table since
    * min/max aggregate map-side to a single row.
    */
  def fromTableSpan(driving: DataFrame, dateCol: String): DataFrame = {
    val bounds = driving.agg(
      min(to_date(col(dateCol))).as("lo"),
      max(to_date(col(dateCol))).as("hi"))
    val dates = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("full_date"))
    build(dates, col("full_date"))
  }

  private def build(dates: DataFrame, d: Column): DataFrame =
    dates.select(attributes(d).map { case (n, c) => c.as(n) }: _*)
}
