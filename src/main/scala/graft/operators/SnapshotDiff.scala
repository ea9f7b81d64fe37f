package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: the keyed delta between two generations of
  * a table — `insert` / `delete` / `update` rows with before/after
  * values, unchanged rows omitted. The missing half of CDC: when a
  * source only hands you full snapshots (the reference's WRITE_TRUNCATE
  * reloads), the diff IS the change feed — feed it to `Upsert.merge`,
  * `Scd2` maintenance, or an audit table.
  *
  * Scale shape: ONE keyed full-outer shuffle join (AQE-splittable,
  * skew-safe) plus a null-safe row compare folded into the same
  * projection — no window, no sort, no driver state. Output is
  * delta-sized. At warehouse scale, pre-prune identical partitions with
  * the stats index (diff only partitions whose files changed) and this
  * degrades gracefully to the touched slice.
  *
  * Columns: `op` (insert/delete/update), the keys, then `b_<col>` /
  * `a_<col>` for every non-key column (null on the absent side).
  * Comparison is NULL-SAFE per column (`<=>`): a null→value or
  * value→null transition is an update, null→null is unchanged. A NULL
  * key never equi-joins (SQL semantics), so a null-keyed row reads as
  * a delete on one side and an insert on the other — the honest answer
  * when the key contract is already broken. */
object SnapshotDiff {

  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff: empty key list")
    val cols = before.columns.toSeq
    // names AND types: same-named columns of different types would pass a
    // name-only check and then silently coerce through the null-safe compare
    def shape(df: DataFrame) = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
    require(shape(after) == shape(before),
      s"diff: schemas differ — before ${shape(before).mkString(",")} vs " +
        s"after ${shape(after).mkString(",")} (align columns first)")
    val nonKeys = cols.filterNot(keys.contains)
    def tagged(df: DataFrame, side: String) = {
      val keyed = keys.foldLeft(df)((d, k) =>
        d.withColumnRenamed(k, s"${side}_$k"))
      nonKeys.foldLeft(keyed)((d, c) =>
        d.withColumnRenamed(c, s"${side}_$c"))
        .withColumn(s"_in_$side", lit(true))
    }
    val b = tagged(before, "b")
    val a = tagged(after, "a")
    val cond = keys.map(k => col(s"b_$k") === col(s"a_$k")).reduce(_ && _)
    val joined = b.join(a, cond, "full_outer")
    val inB = col("_in_b").isNotNull
    val inA = col("_in_a").isNotNull
    val changed = nonKeys.map(c => !(col(s"b_$c") <=> col(s"a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(inB && inA, when(changed, lit("update")))
      .when(inA, lit("insert"))
      .otherwise(lit("delete"))
    joined
      .withColumn("op", op)
      .where(col("op").isNotNull) // in-both-and-identical rows drop
      .select(col("op") +:
        keys.map(k => coalesce(col(s"b_$k"), col(s"a_$k")).as(k)) ++:
        nonKeys.flatMap(c => Seq(col(s"b_$c"), col(s"a_$c"))): _*)
  }
}
