package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation — the subsetting a
  * training-data pipeline actually needs at 100 TB, where `rand()` is
  * the wrong tool three ways: not reproducible across reruns, not
  * stable under backfills (yesterday's sample changes when the job
  * re-executes), and not re-derivable by another engine auditing the
  * pipeline.
  *
  * The selector is a pure function of the ROW KEY: the first 8 hex
  * chars of `md5(key)` read as an unsigned 32-bit integer, kept iff
  * `< rate · 2³²` (cf. the reference's deterministic `md5` surrogate
  * keys, dim_customers.sql:21 — same portability argument). Properties:
  *
  *  - scan-local: a map-side filter, no shuffle, no state — prunes at
  *    full scan bandwidth and composes with every pushdown;
  *  - stable: a document keeps/loses membership only if its KEY
  *    changes; growing the rate strictly GROWS the sample (nested
  *    samples for free: the 1% sample ⊂ the 10% sample — A/B corpus
  *    ablations read the same files);
  *  - portable: any engine with `md5` re-derives the exact member set
  *    (DuckDB oracle parity is the gate's proof).
  *
  * [[stratified]] varies the rate per stratum (downsample the dominant
  * language, keep the long tail); [[takePerStratum]] is the exact-n
  * variant — the md5 order is a deterministic uniform shuffle, so the
  * first n per stratum ARE a uniform sample of it, reproducible
  * everywhere. */
object Sampling {

  /** Unsigned 32-bit bucket of `md5(key)` — uniform on [0, 2³²). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  private def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"sample rate $rate outside [0,1]")
    math.round(rate * 4294967296.0) // rate · 2³², exact at these widths
  }

  /** Keep each row iff its key's hash bucket falls under `rate`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(hashBucket(col(keyCol)) < lit(threshold(rate)))

  /** Per-stratum rates (`strataCol` value → rate; `defaultRate` for
    * unlisted strata). One scan, one map-side filter — the rate lookup
    * compiles to a CASE over the (small, literal) rate table. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double],
                 defaultRate: Double): DataFrame = {
    val cases = rates.toSeq.sortBy(_._1).foldLeft(
      when(lit(false), lit(0L))) { case (acc, (v, r)) =>
      acc.when(col(strataCol) === lit(v), lit(threshold(r)))
    }.otherwise(lit(threshold(defaultRate)))
    df.where(hashBucket(col(keyCol)) < cases)
  }

  /** Exactly `n` rows per stratum, chosen by md5 order (ties broken by
    * key — md5 collisions on distinct keys are negligible but the
    * determinism contract must not rest on their absence). The hash
    * order is a uniform permutation, so this IS uniform sampling with
    * an exact size. One shuffle on the stratum key; the per-stratum
    * sort is AQE-split like any window. */
  def takePerStratum(df: DataFrame, keyCol: String, strataCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, s"takePerStratum: n=$n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_rn")
  }
}
