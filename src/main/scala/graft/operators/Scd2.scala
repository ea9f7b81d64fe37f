package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 builders.
  *
  * The reference implements SCD2 as a BigQuery MERGE + two INSERTs per day
  * (/root/reference/sql/core/dim/dim_customers.sql): expire changed current
  * rows, insert new versions, allocate sequential surrogate keys. Spark-first
  * that splits into:
  *
  *  - [[fromHistory]]: derive the full SCD2 version table from a change feed
  *    in ONE pass — change-detection (`lag`) + validity intervals (`lead`)
  *    inside a single `Window.partitionBy(key)`, i.e. exactly one shuffle on
  *    the natural key no matter how long the history. This is the scale path:
  *    rebuilding from history is embarrassingly parallel per key, while the
  *    reference's per-day MERGE serializes on the warehouse.
  *  - [[mergeSnapshot]]: the reference's incremental day-merge semantics
  *    (current dim + today's snapshot → new dim) for pipelines that must
  *    roll forward.
  *  - [[snapshotDim]]: a single full snapshot as an all-current dim.
  *
  * Surrogate keys are hash-based everywhere — deterministic and map-side,
  * never a global `row_number` (a no-partition window is a single-task
  * bottleneck at 100 TB): `md5(natural key [, effective date])` on the
  * snapshot/merge paths (portable across engines, used by the gated star
  * queries), `xxhash64` on [[fromHistory]] (compact 8-byte key for the
  * biggest dims). A per-key `version` number is also emitted where a
  * windowed pass already exists.
  */
object Scd2 {

  /** SCD2 version table from an append-only change feed.
    *
    * @param history  change feed (one row per observation)
    * @param key      natural key column
    * @param ts       observation timestamp column
    * @param tracked  attribute whose changes open a new version
    * @param tieBreak extra ordering columns for deterministic order on ts ties
    */
  def fromHistory(history: DataFrame, key: String, ts: String,
                  tracked: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val orderCols: Seq[Column] = col(ts) +: tieBreak.map(col)
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    // Keep only rows where the tracked attribute actually changed.
    val changes = history
      .withColumn("_prev", lag(col(tracked), 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= col(tracked))
      .drop("_prev")
    // Validity interval + per-key version over the *filtered* rows.
    val w2 = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    changes
      .withColumn("effective_ts", col(ts))
      .withColumn("expiration_ts", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("expiration_ts").isNull)
      .withColumn("version", row_number().over(w2))
      .withColumn("sk", xxhash64(col(key), col("effective_ts")))
  }

  /** TIME TRAVEL over an SCD2 dimension: the dimension AS OF `ts` — one
    * row per key whose validity interval covers the instant
    * (`effective_ts ≤ ts < expiration_ts`, current rows open-ended).
    * This is the question SCD2 exists to answer ("what did the customer
    * look like last March?") and it is a pure map-side filter: no
    * shuffle, no window — the interval columns [[fromHistory]] built
    * carry the whole answer, and partition/file pruning on
    * `effective_ts` applies when the dim is stored sorted/clustered by
    * it. Keys born after `ts` are absent, exactly like the historical
    * table would have been. */
  def snapshotAt(dim: DataFrame, ts: Column,
                 effectiveCol: String = "effective_ts",
                 expirationCol: String = "expiration_ts"): DataFrame =
    dim.where(col(effectiveCol) <= ts &&
      (col(expirationCol).isNull || col(expirationCol) > ts))

  /** One full snapshot as an SCD2-shaped dimension: every row current,
    * effective from `effectiveDate` (reference treats initial load this way).
    *
    * Surrogate key = `md5(natural key)`: purely map-side (no global
    * `row_number` window, which would funnel the whole dim through one task
    * at scale), deterministic, and portable across engines — the reference's
    * sequential `ROW_NUMBER() + MAX(sk)` allocation
    * (dim_customers.sql:5-9) serializes on the warehouse for no semantic
    * gain; any stable unique id satisfies the star-schema contract.
    */
  def snapshotDim(snapshot: DataFrame, naturalKey: String, skName: String,
                  effectiveDate: String = "1970-01-01"): DataFrame = {
    snapshot
      .withColumn(skName, md5(col(naturalKey).cast("string")))
      .withColumn("effective_date", lit(effectiveDate).cast("date"))
      .withColumn("expiration_date", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
  }

  /** Reference MERGE semantics (dim_customers.sql:14-76): given the current
    * SCD2 dim and a new day snapshot, expire changed rows as of `loadDate`
    * and append new versions; unchanged rows pass through.
    *
    * One shuffle (outer join on the natural key); no MERGE/UPDATE needed —
    * the new dim is written whole (or per-partition with dynamic partition
    * overwrite for idempotent backfills).
    */
  def mergeSnapshot(dim: DataFrame, snapshot: DataFrame, naturalKey: String,
                    attrs: Seq[String], loadDate: String): DataFrame = {
    // Snapshot columns are renamed up front: dim and snapshot often share
    // lineage (yesterday's dim was built from the same source), and a join
    // between them would otherwise hit Spark's ambiguous-self-join check.
    def s(c: String) = s"_snap_$c"
    val snap = snapshot.select((naturalKey +: attrs).map(c => col(c).as(s(c))): _*)
    val current = dim.where(col("is_current"))
    val past = dim.where(!col("is_current"))

    val joined = current.join(snap, col(naturalKey) === col(s(naturalKey)), "full_outer")
    val changed = attrs.map(a => col(a) =!= col(s(a))).reduce(_ || _)
    val ld = lit(loadDate).cast("date")
    val outCols = (naturalKey +: attrs) ++ Seq("effective_date", "expiration_date", "is_current")

    // 1. untouched current rows (no snapshot row, or identical attributes)
    val kept = joined
      .where(col(naturalKey).isNotNull && (col(s(naturalKey)).isNull || !changed))
      .select(outCols.map(col): _*)
    // 2. expired versions of changed rows
    val expired = joined
      .where(col(naturalKey).isNotNull && col(s(naturalKey)).isNotNull && changed)
      .select(outCols.map(col): _*)
      .withColumn("expiration_date", ld)
      .withColumn("is_current", lit(false))
    // 3. new versions: brand-new keys + new versions of changed keys
    val fresh = joined
      .where(col(s(naturalKey)).isNotNull && (col(naturalKey).isNull || changed))
      .select((naturalKey +: attrs).map(c => col(s(c)).as(c)): _*)
      .withColumn("effective_date", ld)
      .withColumn("expiration_date", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

    past.select(outCols.map(col): _*)
      .unionByName(kept)
      .unionByName(expired.select(outCols.map(col): _*))
      .unionByName(fresh.select(outCols.map(col): _*))
      .withColumn("sk", md5(concat_ws(":",
        col(naturalKey).cast("string"), col("effective_date").cast("string"))))
  }
}
