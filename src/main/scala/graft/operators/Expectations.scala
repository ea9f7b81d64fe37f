package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-tests /
  * Great-Expectations layer an ETL runs between landing and publishing:
  * each check names a contract, the report counts its violations, and a
  * gate (`requirePass`) turns red rows into a loud failure instead of a
  * silently-published bad table.
  *
  * Scale shape: every row-local check (not-null, range, set membership,
  * arbitrary predicate) AND the uniqueness check fold into ONE
  * aggregation over one scan (uniqueness is `count(*) −
  * count(distinct key-struct)` — the distinct rides the same two-phase
  * aggregate). Only referential integrity costs a join — a left-anti
  * against the (distinct) referenced keys, broadcast when the key set is
  * dim-sized. Nothing collects; the report is a ≤ #checks-row relation.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** Row-local checks: violation is a per-row predicate. */
  sealed trait RowCheck extends Check { def violated: Column }

  final case class NotNull(column: String) extends RowCheck {
    val name = s"not_null($column)"
    def violated: Column = col(column).isNull
  }

  /** Violations = non-null values outside [lo, hi] (nulls are
    * [[NotNull]]'s business, not a range violation). */
  final case class InRange(column: String, lo: Double, hi: Double) extends RowCheck {
    val name = s"range($column,$lo,$hi)"
    def violated: Column =
      col(column).isNotNull && (col(column) < lo || col(column) > hi)
  }

  final case class InSet(column: String, values: Seq[String]) extends RowCheck {
    val name = s"in_set($column)"
    def violated: Column =
      col(column).isNotNull && !col(column).isin(values: _*)
  }

  /** Arbitrary row contract: a row violates when the predicate is false
    * OR null (an unevaluable contract is not a passing one). */
  final case class Predicate(label: String, holds: Column) extends RowCheck {
    val name = s"predicate($label)"
    def violated: Column = !coalesce(holds, lit(false))
  }

  /** Violations = surplus rows beyond one per key:
    * `count(*) − count(distinct struct(cols))`. */
  final case class UniqueKey(columns: Seq[String]) extends Check {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Table-level staleness contract (the Airflow-sensor class of check):
    * the newest `tsCol` value must lie within `maxLagDays` of `anchorTs`
    * (the run's logical date — pass it in; never CURRENT_DATE, which
    * would make the report non-reproducible). An empty or all-null table
    * is STALE by definition — no data is not fresh data. Violations are
    * 0 or 1: staleness is a table property, not a row count. */
  final case class Freshness(tsCol: String, anchorTs: String,
                             maxLagDays: Int) extends Check {
    val name = s"freshness($tsCol,${maxLagDays}d)"
  }

  /** Violations = rows (not keys) whose non-null `column` has no match
    * in `ref.refColumn` — the FK contract. */
  final case class RefIntegrity(column: String, ref: DataFrame,
                                refColumn: String) extends Check {
    val name = s"ref($column->$refColumn)"
  }

  /** Evaluate all checks → `(check, violations, pass)`, one row per
    * check, ordered by name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: no checks")
    require(checks.map(_.name).distinct.size == checks.size,
      "expectations: duplicate check names")
    val onePass: Seq[(String, Column)] = checks.collect {
      case c: RowCheck =>
        c.name -> sum(when(c.violated, 1L).otherwise(0L))
      case c: UniqueKey =>
        c.name -> (count(lit(1)) -
          countDistinct(struct(c.columns.map(col): _*)))
      case c: Freshness =>
        // fresh → 0; stale → the when is false → null → coalesce to 1;
        // empty/all-null → max is null → null → 1 (stale by definition)
        c.name -> coalesce(
          when(max(col(c.tsCol)) >=
            to_timestamp(lit(c.anchorTs)) -
              expr(s"INTERVAL ${c.maxLagDays} DAYS"), 0L),
          lit(1L))
    }
    val scalarReport =
      if (onePass.isEmpty) None
      else {
        val aggRow = df.agg(onePass.head._2.as("c0"),
          onePass.tail.zipWithIndex.map { case ((_, a), i) => a.as(s"c${i + 1}") }: _*)
        val stackExpr = onePass.zipWithIndex
          .map { case ((n, _), i) => s"'${n.replace("'", "''")}', c$i" }
          .mkString(", ")
        Some(aggRow.selectExpr(
          s"stack(${onePass.size}, $stackExpr) AS (check, violations)"))
      }
    val refReports = checks.collect { case c: RefIntegrity =>
      df.select(col(c.column)).where(col(c.column).isNotNull)
        .join(c.ref.select(col(c.refColumn).as(c.column)).distinct(),
          Seq(c.column), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(c.name).as("check"), col("violations"))
    }
    (scalarReport.toSeq ++ refReports).reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check")
  }

  /** The gate: throw, naming every failing check and its count, unless
    * the whole report passes. */
  def requirePass(report: DataFrame): Unit = {
    val failing = report.where(!col("pass"))
      .collect().map(r => s"${r.getString(0)}: ${r.getLong(1)} violations")
    require(failing.isEmpty,
      s"data-quality gate failed:\n  ${failing.mkString("\n  ")}")
  }
}
