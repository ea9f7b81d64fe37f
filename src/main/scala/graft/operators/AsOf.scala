package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * (the window reality); [[asofJoinSplit]] is the in-library mitigation —
  * census-driven time-range sub-partitioning with a boundary-carry fix-up.
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

  /** The tagged union both variants window over: left rows tag 1 with the
    * original row packed in `_lrow`; right rows tag 0 with the carry
    * payload packed in `_carry` (NULL-keyed / NULL-ts right rows dropped —
    * they have no place on the timeline; left rows always survive). */
  private def taggedUnion(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          valueCols: Seq[String], prefix: String): DataFrame = {
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
    l.unionByName(r)
  }

  /** Project the carried match back to the caller's schema. */
  private def project(carried: DataFrame, leftCols: Seq[String],
                      carryCols: Seq[String], prefix: String,
                      rightTs: String, tolerance: Option[Column]): DataFrame = {
    val matched = tolerance match {
      case Some(tol) =>
        when(col("_m").getField(rightTs) >= col("_t") - tol, col("_m"))
      case None => col("_m")
    }
    carried.select(
      leftCols.map(c => col("_lrow").getField(c).as(c)) ++
        carryCols.map(c => matched.getField(c).as(prefix + c)): _*)
  }

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String], prefix: String = "asof_",
               tolerance: Option[Column] = None): DataFrame = {
    val u = taggedUnion(left, right, leftKey, rightKey, leftTs, rightTs,
      valueCols, prefix)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"), col("_carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u
      .withColumn("_m", last(col("_carry"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    project(carried, left.columns.toSeq, rightTs +: valueCols, prefix,
      rightTs, tolerance)
  }

  /** [[asofJoin]] with HOT-KEY mitigation: a key owning more rows than
    * `maxKeyRows` no longer serializes through one window partition.
    *
    * Two-pass split, output IDENTICAL to the unsplit path (spec + stress
    * pinned):
    *
    *  1. CENSUS: one count/min/max aggregation per key; keys above
    *     `maxKeyRows` become the (by definition tiny) hot relation,
    *     broadcast back. Each hot key's timeline is sliced into
    *     `ceil(n / maxKeyRows)` contiguous TIME ranges (uniform in the
    *     ts value — balanced for ~steady event rates; a bursty key
    *     degrades toward fewer effective subs, never toward wrong
    *     results). Sub assignment is map-side arithmetic; cold keys take
    *     sub 0. Time slicing (not hash) is what keeps the carry fixable:
    *     `sub` is MONOTONE in ts, so everything in sub s-1 precedes
    *     everything in sub s.
    *  2. the carry window runs per (key, sub) — parallelism = subs, and
    *     per-partition sort buffers shrink by the same factor;
    *  3. BOUNDARY FIX-UP: per (key, sub) the tail carry = greatest
    *     (ts, payload) right row of the sub (an aggregation, not a
    *     window); the carry ENTERING sub s = last non-null tail over subs
    *     < s — a window over the boundary relation, which has one row per
    *     (hot key, sub): broadcast-grade tiny. Left rows whose local
    *     carry is NULL (they precede every right row in their own sub)
    *     coalesce to the entering carry.
    *
    * `tsNumeric` requirement: slicing needs ts arithmetic, so the ts
    * column must be timestamp/date/numeric (anything with a monotone
    * double image). */
  def asofJoinSplit(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    leftTs: String, rightTs: String,
                    valueCols: Seq[String], prefix: String = "asof_",
                    tolerance: Option[Column] = None,
                    maxKeyRows: Long = 2000000L,
                    maxSubs: Int = 1024): DataFrame = {
    require(maxKeyRows >= 1, s"maxKeyRows=$maxKeyRows must be >= 1")
    require(maxSubs >= 2, s"maxSubs=$maxSubs: need >= 2 for any split")
    val u = taggedUnion(left, right, leftKey, rightKey, leftTs, rightTs,
      valueCols, prefix)
    // a monotone double image of the ts for slicing arithmetic
    val td = u.schema("_t").dataType match {
      case TimestampType | TimestampNTZType => col("_t").cast("double")
      case DateType => col("_t").cast("timestamp").cast("double")
      case _: NumericType => col("_t").cast("double")
      case other => throw new IllegalArgumentException(
        s"asofJoinSplit needs a timestamp/date/numeric ts for time slicing, got $other")
    }
    val withTd = u.withColumn("_td", td)
    // census: per-key volume + time span; only keys over the cap matter
    val hot = withTd.groupBy(col("_k"))
      .agg(count(lit(1)).as("_n"), min(col("_td")).as("_tmin"),
        max(col("_td")).as("_tmax"))
      .where(col("_n") > maxKeyRows)
      .select(col("_k"),
        least(ceil(col("_n") / maxKeyRows), lit(maxSubs.toLong)).as("_nsubs"),
        col("_tmin"), col("_tmax"))
    // sub assignment, map-side off the broadcast census; span 0 (all rows
    // one instant) degenerates to sub 0 — correct, just unsplit
    val span = col("_tmax") - col("_tmin")
    val sub = when(col("_nsubs").isNull || span === 0d, lit(0L))
      .otherwise(least(
        floor((col("_td") - col("_tmin")) / span * col("_nsubs")),
        col("_nsubs") - 1))
    val assigned = withTd.join(broadcast(hot), Seq("_k"), "left")
      .withColumn("_sub", sub)
      .withColumn("_hot", col("_nsubs").isNotNull)
      .select("_k", "_t", "_tag", "_lrow", "_carry", "_sub", "_hot")
    // pass 2: the carry window, now per (key, sub)
    val w = Window.partitionBy(col("_k"), col("_sub"))
      .orderBy(col("_t"), col("_tag"), col("_carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = assigned
      .withColumn("_m_local", last(col("_carry"), ignoreNulls = true).over(w))
    // boundary relation, HOT keys only (cold keys have one sub — nothing
    // to fix up): per (key, sub) the tail carry among that sub's RIGHT
    // rows = greatest (ts, payload), matching the tie rule. One row per
    // (hot key, sub) at most; subs are capped, so this is broadcast-grade.
    val tails = assigned
      .where(col("_hot") && col("_tag") === 0)
      .groupBy(col("_k"), col("_sub"))
      .agg(max(struct(col("_t"), col("_carry"))).as("_tail"))
    // every (hot key, sub) PRESENT IN THE DATA needs an entering carry —
    // including subs with no right rows at all (their tail is null; the
    // strictly-before window carries an earlier sub's tail across them)
    val dataSubs = assigned.where(col("_hot"))
      .select(col("_k"), col("_sub")).distinct()
    val wb = Window.partitionBy(col("_k")).orderBy(col("_sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val enterAll = dataSubs
      .join(tails, Seq("_k", "_sub"), "left")
      .withColumn("_enter_struct", last(col("_tail"), ignoreNulls = true).over(wb))
      .select(col("_k"), col("_sub"),
        col("_enter_struct").getField("_carry").as("_enter"))
      .where(col("_enter").isNotNull)
    // left rows whose local carry is null precede every right row of their
    // own sub: their match is exactly the carry entering the sub
    val fixed = local.join(broadcast(enterAll), Seq("_k", "_sub"), "left")
      .withColumn("_m", coalesce(col("_m_local"), col("_enter")))
      .where(col("_tag") === 1)
    project(fixed, left.columns.toSeq, rightTs +: valueCols, prefix,
      rightTs, tolerance)
  }
}
