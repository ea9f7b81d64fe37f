package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{IndexedScan, StatsIndex}

/** Change data feed + time travel over a VERSIONED table
  * ([[Upsert.mergeIntoVersioned]] + [[graft.sources.StatsIndex]]
  * generations) — the read half of the copy-on-write manifest: every
  * generation is an immutable file-list snapshot, so
  *
  *  - `asOf(gen)` reads ANY retained generation consistently (Delta's
  *    `VERSION AS OF`) by mounting that generation's stats rows as the
  *    scan's [[graft.sources.GraftFileIndex]] — replaced files are
  *    still on disk until vacuum, so the old snapshot is bit-identical;
  *  - `between(from, to)` emits the keyed change rows
  *    (insert / delete / update with before/after values,
  *    [[SnapshotDiff]] semantics) WITHOUT diffing the whole table: the
  *    two generations' manifests are first diffed on FILE NAMES
  *    (driver-side, metadata scale), and only partitions whose file
  *    sets changed enter the join — a merge that touched 3 of 10 000
  *    partitions costs a 3-partition diff, not a table scan. That is
  *    the CDF-at-100 TB shape: change cost ∝ changed slice.
  *
  * The partition-pruning step is CONSERVATIVE by construction:
  * [[Upsert.mergeIntoVersioned]] rewrites every touched partition's
  * files under fresh `gen-<runId>-` names, so a partition with ANY row
  * change always has a file-set change; an untouched partition's rows
  * survive in the manifest verbatim and its files never differ. A
  * byte-identical rewrite (touched but unchanged partition) enters the
  * diff and contributes zero rows — wasted read, never a wrong answer.
  */
object ChangeFeed {

  /** Read the table AS OF index generation `gen` (files named by that
    * generation's manifest — see [[graft.sources.IndexedScan
    * .readIndexedFrom]]). Throws if the generation directory is gone
    * (vacuumed past retention). */
  def asOf(spark: SparkSession, tablePath: String, indexRoot: String,
           gen: Long): DataFrame =
    IndexedScan.readIndexedGeneration(spark, tablePath, indexRoot, gen)

  /** Hive-unescaped values of `partitionCol` whose FILE SETS differ
    * between the two manifests (either direction). Driver-side over the
    * manifests' distinct file names — metadata scale. */
  private[graft] def changedPartitions(spark: SparkSession,
                                       fromStats: DataFrame, toStats: DataFrame,
                                       partitionCol: String): Seq[String] = {
    def files(s: DataFrame): Set[String] =
      s.select(col("file")).distinct().collect().map(_.getString(0)).toSet
    val a = files(fromStats)
    val b = files(toStats)
    val changed = (a diff b) union (b diff a)
    val seg = s"/$partitionCol=([^/]+)/".r
    changed.toSeq
      .flatMap(f => seg.findFirstMatchIn(f).map(_.group(1)))
      .distinct
      .map(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName)
      .sorted
  }

  /** Keyed change rows between generations `fromGen` → `toGen`:
    * [[SnapshotDiff.diff]] columns (`op`, keys, `b_*`/`a_*`), computed
    * over ONLY the partitions whose file manifests changed. `columns`
    * optionally projects the compared payload (keys and `partitionCol`
    * are always included); default = full schema. */
  def between(spark: SparkSession, tablePath: String, indexRoot: String,
              fromGen: Long, toGen: Long, keys: Seq[String],
              partitionCol: String, columns: Seq[String] = Nil): DataFrame = {
    require(fromGen != toGen, s"between: fromGen == toGen == $fromGen")
    val fromStats = StatsIndex.load(spark, s"$indexRoot/_v=$fromGen")
      .localCheckpoint()
    val toStats = StatsIndex.load(spark, s"$indexRoot/_v=$toGen")
      .localCheckpoint()
    val touched = changedPartitions(spark, fromStats, toStats, partitionCol)
    def restrict(stats: DataFrame): DataFrame = {
      val hit = touched.map { v =>
        val seg = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(v)
        col("file").contains(s"/$partitionCol=$seg/")
      }.reduce(_ || _)
      stats.where(hit)
    }
    // Symmetry matters: the two sides must cover the SAME partition set
    // or untouched rows on one side would read as phantom inserts/
    // deletes. If either restricted slice is file-empty (all touched
    // partitions are new on the other side — the scan needs ≥1 file to
    // infer its schema) or no partition changed at all (empty diff, but
    // a frame still needs a schema), both sides fall back to their full
    // manifests; the extra untouched rows compare equal and vanish.
    val (fromSlice, toSlice) =
      if (touched.isEmpty) (fromStats, toStats)
      else {
        val (rf, rt) = (restrict(fromStats), restrict(toStats))
        if (rf.isEmpty || rt.isEmpty) (fromStats, toStats) else (rf, rt)
      }
    def read(stats: DataFrame, gen: Long): DataFrame = {
      val df = IndexedScan.readIndexedFrom(spark, tablePath, stats,
        dataSchema = StatsIndex.generationSchema(spark, indexRoot, gen))
      if (columns.isEmpty) df
      else df.select((keys ++ Seq(partitionCol) ++ columns).distinct.map(col): _*)
    }
    val from = read(fromSlice, fromGen)
    val to = read(toSlice, toGen)
    // schema evolution across the hop: align both sides to the union of
    // columns (from-side order first), missing columns as typed nulls —
    // a value landing in a NEW column is then an update (null <=> value
    // is false), while history's null-vs-null compares unchanged
    val toOnly = to.schema.fields.filterNot(f => from.columns.contains(f.name))
    val target = from.schema.fields ++ toOnly
    def aligned(df: DataFrame): DataFrame =
      df.select(target.map { f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    // a shared column whose TYPE differs between generations is not
    // aligned away — SnapshotDiff's schema require rejects it loudly
    // (mergeIntoVersioned refuses type evolution, so this only fires on
    // hand-built generations)
    SnapshotDiff.diff(aligned(from), aligned(to), keys)
  }
}
