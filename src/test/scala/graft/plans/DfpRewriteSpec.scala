package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{IndexedScan, StatsIndex}

/** The opt-in auto-DFP rule ([[DfpRewrite]]): a PLAIN `fact.join(dim)`
  * over a [[graft.sources.GraftFileIndex]] relation must prune fact
  * files through the dim's keys under the flag — identical results, no
  * call-site plumbing — and must leave every non-matching shape exactly
  * as written. */
class DfpRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val Flag = "spark.graft.rewrite.dfp"

  private def withFlag[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.getOption(Flag)
    spark.conf.set(Flag, on.toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(Flag, v)
      case None => spark.conf.unset(Flag)
    }
  }

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
    // the indexed fact scan is the one over the 8-file table
    val found = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[graft.sources.GraftFileIndex])
    assert(found.size == 1, s"expected one indexed scan, got ${found.size}")
    found.head.metrics("numFiles").value
  }

  // scattered keys: every file spans the whole id range — only the
  // dim-key bloom probe can prune anything (the dfpJoin fixture shape)
  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-dfprule").toString
    spark.range(40000).select(col("id"), (col("id") % 1000).as("v"))
      .repartition(8).write.parquet(s"$r/t")
    r
  }
  private lazy val stats = StatsIndex.build(spark, s"$root/t").localCheckpoint()
  private lazy val blooms = StatsIndex.buildBlooms(spark, s"$root/t",
    Seq("id"), expectedItemsPerFile = 10000).localCheckpoint()
  private def fact = IndexedScan.readIndexedFrom(spark, s"$root/t",
    stats, Some(blooms))
  private def dim = Seq((77L, "x"), (31007L, "y")).toDF("k", "tag")

  test("flag on: a plain inner join prunes fact files through the dim keys; results identical") {
    val wantRows = spark.read.parquet(s"$root/t")
      .join(dim, col("id") === col("k"))
      .select("id", "v", "tag").collect().map(_.toSeq).toSet
    assert(wantRows.size == 2)

    val joined = fact.join(dim, col("id") === col("k"))
      .select("id", "v", "tag")
    withFlag(on = true) {
      val n = scanFiles(joined)
      assert(n <= 3, s"auto-DFP should isolate the 2 keys' files, scanned $n of 8")
      assert(joined.collect().map(_.toSeq).toSet == wantRows)
    }
    // flag off: same answer, every file scanned (min/max hopeless here)
    withFlag(on = false) {
      val cold = fact.join(dim, col("id") === col("k")).select("id", "v", "tag")
      assert(scanFiles(cold) == 8, "rule fired with the flag off")
      assert(cold.collect().map(_.toSeq).toSet == wantRows)
    }
  }

  test("flag on: left_semi prunes; dim side of the equality may come first") {
    withFlag(on = true) {
      val semi = fact.join(dim, col("k") === col("id"), "left_semi")
      assert(scanFiles(semi) <= 3)
      assert(semi.select("id").as[Long].collect().sorted.toSeq ==
        Seq(77L, 31007L))
    }
  }

  test("non-matching shapes are left exactly as written") {
    withFlag(on = true) {
      // outer join: injection would drop unmatched fact rows — untouched
      val outer = fact.join(dim, col("id") === col("k"), "left_outer")
      assert(scanFiles(outer) == 8, "outer join must not be rewritten")
      assert(outer.count() == 40000)

      // over the key cap: join proceeds unpruned, same answer
      val prevCap = spark.conf.getOption("spark.graft.rewrite.dfp.maxKeys")
      spark.conf.set("spark.graft.rewrite.dfp.maxKeys", "1")
      try {
        val capped = fact.join(dim, col("id") === col("k"))
        assert(scanFiles(capped) == 8, "over-cap dim must leave the join as written")
        assert(capped.count() == 2)
      } finally prevCap match {
        case Some(v) => spark.conf.set("spark.graft.rewrite.dfp.maxKeys", v)
        case None => spark.conf.unset("spark.graft.rewrite.dfp.maxKeys")
      }

      // a big non-indexed side joining a big non-indexed side: no-op
      val plain = spark.read.parquet(s"$root/t")
      val pp = plain.join(dim, col("id") === col("k"))
      assert(pp.count() == 2)
    }
  }

  test("empty dim key set: the join answers empty without scanning the fact") {
    withFlag(on = true) {
      val emptyDim = dim.where(col("tag") === "nope")
      val j = fact.join(emptyDim, col("id") === col("k"))
      assert(j.count() == 0)
      val plan = j.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Join"),
        s"empty-key join should collapse via PropagateEmptyRelation:\n$plan")
    }
  }

  test("a user-written IN on the key is respected, not doubled") {
    withFlag(on = true) {
      val j = fact.where(col("id").isin(77L, 31007L, 5L))
        .join(dim, col("id") === col("k"))
      assert(scanFiles(j) <= 4)
      assert(j.count() == 2)
    }
  }

  test("auto-DFP composes with the versioned (time-travel) read") {
    // a mergeIntoVersioned-maintained table reads through the same
    // GraftFileIndex the rule matches — the lakehouse read path gets
    // dynamic file pruning with zero call-site plumbing. Key-clustered
    // partitions (ids 0-999 in d0, …) so min/max stats alone prune.
    val r = Files.createTempDirectory("graft-dfpv").toString
    val (path, idx) = (s"$r/t", s"$r/t/_stats_v")
    graft.operators.Upsert.mergeIntoVersioned(path,
      spark.range(4000).select(col("id").as("order_id"),
        concat(lit("d"), (col("id") / 1000).cast("long")).as("day"),
        (col("id") % 7).cast("double").as("amount"))
        .repartition(col("day")),
      Seq("order_id"), "day", idx)
    val vfact = IndexedScan.readIndexedVersioned(spark, path, idx)
    val vdim = Seq(1205L, 1400L).toDF("k")
    withFlag(on = true) {
      val j = vfact.join(vdim, col("order_id") === col("k"))
      assert(j.count() == 2)
      assert(scanFiles(j) == 1,
        "dim keys land in one partition's id range — 1 of 4 files")
    }
    withFlag(on = false) {
      val j = vfact.join(vdim, col("order_id") === col("k"))
      assert(j.count() == 2)
      assert(scanFiles(j) == 4, "flag off: unpruned")
    }
  }
}
