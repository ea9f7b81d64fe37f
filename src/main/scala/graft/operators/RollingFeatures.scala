package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-horizon trailing-window features — the feature-store shape:
  * for every event, the trailing 1d/7d/30d/… aggregates of the same
  * key's history (`RANGE BETWEEN h PRECEDING AND CURRENT ROW` on epoch
  * seconds), all horizons in ONE pass.
  *
  * Scale shape: every horizon shares the same `(key, sec)` partition +
  * order, so the plan carries ONE exchange and ONE sort no matter how
  * many horizons stack (each extra frame is another window pass over
  * already-sorted, already-co-located rows — never another shuffle).
  * Event-time RANGE frames include same-second peers deterministically
  * (frame membership depends on the ORDER VALUE, not row order).
  *
  * Determinism contract (what lets an oracle reproduce the doubles):
  * sums accumulate INTEGER CENTS (`round(value·100)` as long) — a
  * sliding-window double sum is association-order-dependent and engines
  * disagree in the last ulp (segment trees vs incremental buffers), but
  * integer sums are exact; the decimal value and the mean re-derive
  * from the exact sum by one fixed division tree. */
object RollingFeatures {

  /** A named trailing horizon: `seconds` back from (and including) each
    * row's second. */
  final case class Horizon(name: String, seconds: Long) {
    require(seconds > 0, s"horizon $name: seconds must be positive")
  }

  val Day: Horizon = Horizon("1d", 86400L)
  val Week: Horizon = Horizon("7d", 7L * 86400)
  val Month: Horizon = Horizon("30d", 30L * 86400)

  /** Append, per input row: `sec` (epoch second) and, per horizon `h`,
    * `n_<h>` (trailing row count), `v_<h>` (trailing sum of
    * `valCol`, cent-exact), `avg_<h>` (value per trailing EVENT:
    * `v/n` as one raw double division — rows with a null value count
    * in `n` but not in `v`, so this is sum-per-event, not SQL `AVG`).
    * Rows with a null timestamp are dropped (no place on the time
    * axis). */
  def trailing(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, horizons: Seq[Horizon],
               withStd: Boolean = false): DataFrame = {
    require(horizons.nonEmpty, "no horizons given")
    require(horizons.map(_.name).distinct.size == horizons.size,
      s"duplicate horizon names: ${horizons.map(_.name).mkString(", ")}")
    val sec = floor(unix_micros(col(tsCol)) / 1000000L).cast("long")
    val base = df.where(col(tsCol).isNotNull)
      .withColumn("sec", sec)
      .withColumn("_cents", round(col(valCol) * 100).cast("long"))
    val out = horizons.foldLeft(base) { (acc, h) =>
      val w = Window.partitionBy(keyCol).orderBy("sec")
        .rangeBetween(-h.seconds, Window.currentRow)
      val n = count(lit(1)).over(w)
      val s1 = sum(col("_cents")).over(w)
      val v = s1 / 100.0
      val withBase = acc.withColumn(s"n_${h.name}", n)
        .withColumn(s"v_${h.name}", v)
        .withColumn(s"avg_${h.name}", v / n.cast("double"))
      if (!withStd) withBase
      else {
        // population moments from EXACT integer sums (Σc, Σc²) — the
        // same determinism story as the sums; Σc² stays in long while
        // n·max(c)² ≤ 9·10^18. Past that bound the sum would silently
        // wrap and emit WRONG moments, so the same window pass carries
        // max|c| and the bound is CHECKED per window — violation raises
        // instead of answering (swap _cents to DecimalType to go past).
        // The mean/sd trees are fixed so an oracle reproduces the doubles.
        val mAbs = coalesce(max(abs(col("_cents"))).over(w), lit(0L))
          .cast("double")
        val s2Safe = mAbs * mAbs * n.cast("double") <= lit(9.0e18)
        val s2 = when(s2Safe, sum(col("_cents") * col("_cents")).over(w))
          .otherwise(raise_error(lit(
            s"RollingFeatures: Σc² over horizon ${h.name} exceeds the " +
              "long-exact bound (n·max(cents)² > 9e18) — moments would " +
              "silently wrap; use a DecimalType accumulator for values " +
              "this large")))
        val m = s1.cast("double") / n
        val sd = sqrt(greatest(
          s2.cast("double") / n - m * m, lit(0.0))) / 100.0
        withBase.withColumn(s"mean_${h.name}", m / 100.0)
          .withColumn(s"sd_${h.name}", sd)
      }
    }
    out.drop("_cents")
  }

  /** Trailing z-score anomalies: rows where `valCol` sits more than
    * `z` trailing standard deviations from the trailing mean of the
    * SAME window (the row itself included — the self-inclusive
    * convention keeps the frame definition identical to [[trailing]],
    * and a true outlier still flags: it moves the mean of a ≥`minN`
    * window far less than it moves itself). Windows thinner than
    * `minN` rows never flag (a 2-row "distribution" has no outliers). */
  def anomalies(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String, horizon: Horizon = Week,
                z: Double = 3.0, minN: Long = 5L): DataFrame = {
    val h = horizon.name
    trailing(df, keyCol, tsCol, valCol, Seq(horizon), withStd = true)
      .where(col(s"n_$h") >= minN &&
        abs(col(valCol) - col(s"mean_$h")) > lit(z) * col(s"sd_$h"))
  }
}
