package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Generic range join: match each point row to every interval row with
  * `lo <= point < hi` (half-open, the standard convention), optionally
  * under additional equi-keys. Without an equi-key Spark plans a raw
  * range predicate as BroadcastNestedLoopJoin — the O(|points|·|intervals|)
  * shape that dies at scale.
  *
  * The scale shape here is INTERVAL BINNING: pick a `binWidth`, each point
  * maps to exactly ONE bin (`floor(p / binWidth)`) map-side, each interval
  * EXPLODES to the bins it overlaps; the join is then an equi-join on
  * (bin, keys…) with the exact range predicate as a residual filter.
  * Because a point owns a single bin and an interval's bins are distinct,
  * every qualifying (point, interval) pair meets exactly once — no
  * dedup pass. Cost: |points| + Σ(interval_len/binWidth) join-input rows,
  * never the cross product.
  *
  * Choosing `binWidth`: ≈ the TYPICAL interval length. Too small explodes
  * long intervals into many bins (input blowup linear in 1/binWidth); too
  * large piles unrelated rows into one bin (residual does the work, bins
  * stop pruning — binWidth → ∞ degenerates to the nested loop). A
  * pathological mega-interval (covers everything) is better handled as a
  * broadcast constant predicate; this operator is for interval SETS.
  *
  * @param keyCols columns present under the SAME name on both sides,
  *                joined as additional equi-keys (the clustered case —
  *                per-user windows, per-host ranges).
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    val overlap = (points.columns.toSet & intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"non-key columns present on both sides: ${overlap.mkString(", ")}")
    // "_bin" is this operator's working column: withColumn would silently
    // clobber (and the final drop lose) a user column of that name
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "'_bin' is reserved by rangeJoin; rename the input column")

    val p = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("_bin", explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, ("_bin" +: keyCols).toSeq)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
