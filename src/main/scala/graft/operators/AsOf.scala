package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: attach to each left row the LATEST right row with
  * `rightTs <= leftTs` for the same key (the time-series enrichment join —
  * "state as of the event": last price at trade time, last profile update
  * at impression time). [[PointInTime.pitJoin]] is the special case where
  * the right side carries validity INTERVALS (SCD2 dims — few versions per
  * key, equi-join + residual is right there); this operator is for plain
  * timestamped right sides with arbitrarily many rows per key, where a
  * join-then-filter would build every (left, right) pair per key before
  * discarding all but one.
  *
  * Implementation is union-tag-window, the shape that survives 100 TB:
  * both sides are tagged and unioned (right rows sort BEFORE left rows at
  * an equal timestamp, so `<=` semantics fall out of the sort), then ONE
  * window per key carries the last non-null right payload forward. Cost is
  * a single hash-exchange of the unioned relation on the key + a per-key
  * sort — no l×r pair blowup, no range-join cross product; per-key work is
  * linear in that key's rows. A mega-key serializes through one partition
  * (the window reality); the mitigation is the same as every per-key
  * window here: pre-split hot keys if the domain allows it.
  *
  * Ties: among right rows sharing (key, ts), the carried row is the
  * greatest by (ts, payload-struct) lexicographic order — deterministic
  * across engines and partitionings, no arbitrary "whichever came last".
  *
  * @param valueCols right columns to attach (emitted as `prefix+name`);
  *                  `rightTs` is always attached as `prefix+rightTs`.
  * @param tolerance optional maximum lookback (e.g.
  *                  `expr("INTERVAL 1 HOUR")`): a match older than
  *                  `leftTs - tolerance` is nulled out, the row kept —
  *                  pandas `merge_asof` semantics.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String], prefix: String = "asof_",
               tolerance: Option[Column] = None): DataFrame = {
    require(left.schema(leftKey).dataType == right.schema(rightKey).dataType,
      s"key type mismatch: $leftKey is ${left.schema(leftKey).dataType}, " +
        s"$rightKey is ${right.schema(rightKey).dataType}")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"ts type mismatch: $leftTs is ${left.schema(leftTs).dataType}, " +
        s"$rightTs is ${right.schema(rightTs).dataType}")
    val attached = (rightTs +: valueCols).map(prefix + _)
    val collisions = attached.toSet & left.columns.toSet
    require(collisions.isEmpty,
      s"prefixed right columns collide with left columns: ${collisions.mkString(", ")}")

    val carryCols = rightTs +: valueCols
    val lrowType = StructType(left.schema.fields)
    val carryType = StructType(carryCols.map(right.schema(_)))

    val l = left.select(
      col(leftKey).as("_k"), col(leftTs).as("_t"), lit(1).as("_tag"),
      struct(left.columns.map(col): _*).as("_lrow"),
      lit(null).cast(carryType).as("_carry"))
    // join semantics for dirty rows: a NULL key never matches anything
    // (Window.partitionBy would otherwise group null-keyed rows TOGETHER
    // and enrich them off each other), and a NULL right timestamp has no
    // place on the timeline — both are dropped from the match side; left
    // rows always survive, unmatched
    val r = right
      .where(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTs).as("_t"), lit(0).as("_tag"),
        lit(null).cast(lrowType).as("_lrow"),
        struct(carryCols.map(col): _*).as("_carry"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"), col("_carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_m", last(col("_carry"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    val matched = tolerance match {
      case Some(tol) =>
        when(col("_m").getField(rightTs) >= col("_t") - tol, col("_m"))
      case None => col("_m")
    }
    carried.select(
      left.columns.map(c => col("_lrow").getField(c).as(c)) ++
        carryCols.map(c => matched.getField(c).as(prefix + c)): _*)
  }
}
