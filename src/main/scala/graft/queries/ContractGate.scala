package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Machine-checked contract gates for the operators whose OUTPUT cannot
  * be re-derived in DuckDB (k-means quantizers, randomized KLL
  * compaction, engine-specific sketch registers, Jacobi eigensolves).
  *
  * The R17 verdict asked that these stop reporting `no_oracle` and
  * instead carry a pass/fail verdict in the correctness artifact. The
  * mechanism: each such gate still RUNS its operator, then checks a set
  * of rigorous contracts against exact baselines computed in Spark
  * (brute-force top-k recall, exact distinct counts vs sketch error
  * bounds, orthonormality residuals, …) and emits one
  * `(contract, ok, detail)` row per check. The DuckDB oracle is the
  * all-pass literal ([[oracle]]) — the driver's hash compare then means
  * "every contract held": a recall collapse, a sketch outside its
  * published error bound, or a non-orthonormal eigenbasis hash-mismatches
  * with the failing contract named in `detail`.
  *
  * `detail` is empty on pass (so the literal oracle matches) and carries
  * the observed value on failure — the mismatch diff itself is then the
  * diagnostic.
  */
object ContractGate {

  /** Verdict frame from driver-side check results (every check value is
    * a bounded Spark aggregate the caller already collected). */
  def verdicts(s: SparkSession, checks: Seq[(String, Boolean, String)]): DataFrame = {
    require(checks.nonEmpty, "contract gate with no checks")
    require(checks.map(_._1).distinct.size == checks.size,
      s"duplicate contract names: ${checks.map(_._1).mkString(", ")}")
    import s.implicits._
    checks.sortBy(_._1)
      .map { case (c, ok, d) => (c, ok, if (ok) "" else d.take(300)) }
      .toDF("contract", "ok", "detail")
      .coalesce(1)
  }

  /** The all-pass DuckDB literal matching [[verdicts]]'s schema and
    * `ORDER BY contract` row order. */
  def oracle(names: Seq[String]): String = {
    require(names.nonEmpty && names.distinct.size == names.size)
    names.foreach(n => require(!n.contains("'"), s"quote in contract name: $n"))
    names.sorted.map(n => s"('$n', true, '')")
      .mkString("SELECT * FROM (VALUES ",
        ", ", ") AS t(contract, ok, detail) ORDER BY contract")
  }

  /** Format helper for failure details. */
  def obs(v: Double): String = f"observed=$v%.6f"
}
