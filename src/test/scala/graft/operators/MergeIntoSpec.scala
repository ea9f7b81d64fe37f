package graft.operators

import java.nio.file.{Files, Path => JPath}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-level MERGE ([[Upsert.mergeInto]]): touched partitions are
  * read-merge-rewritten atomically, untouched partitions are never even
  * opened — their files stay byte-identical.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mergeinto").toString + "/fact"

  private val baseRows = Seq(
    // (order_id, item_id, day, amount)
    (1L, 1L, "2024-01-01", 10.0),
    (1L, 2L, "2024-01-01", 11.0),
    (2L, 1L, "2024-01-02", 20.0),
    (3L, 1L, "2024-01-03", 30.0))

  private def writeBase(path: String): Unit =
    baseRows.toDF("order_id", "item_id", "day", "amount")
      .repartition(1)
      .write.partitionBy("day").parquet(path)

  /** (relative file path -> md5 of bytes) for every data file under dir. */
  private def fileHashes(dir: String): Map[String, String] = {
    val root = java.nio.file.Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(_.getFileName.toString.startsWith("."))
      .map { p =>
        val md = MessageDigest.getInstance("MD5")
        root.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  private def readFact(path: String) =
    spark.read.parquet(path)
      .select("order_id", "item_id", "day", "amount")
      .as[(Long, Long, String, Double)].collect().toSet

  test("matched keys update, new keys insert, untouched partitions byte-identical") {
    val path = tmp()
    writeBase(path)
    val before = fileHashes(path)
    val untouchedBefore = before.filter(_._1.startsWith("day=2024-01-03"))
    assert(untouchedBefore.nonEmpty, "sanity: jan-03 partition has files")

    // batch touches jan-01 (update 1/1, insert 9/1) and jan-02 (update 2/1)
    val updates = Seq(
      (1L, 1L, "2024-01-01", 99.0),
      (9L, 1L, "2024-01-01", 90.0),
      (2L, 1L, "2024-01-02", 21.0)
    ).toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day")

    assert(readFact(path) == Set(
      (1L, 1L, "2024-01-01", 99.0),   // WHEN MATCHED UPDATE
      (1L, 2L, "2024-01-01", 11.0),   // unmatched row in touched partition survives
      (9L, 1L, "2024-01-01", 90.0),   // WHEN NOT MATCHED INSERT
      (2L, 1L, "2024-01-02", 21.0),   // matched in second touched partition
      (3L, 1L, "2024-01-03", 30.0)))  // untouched partition intact

    val after = fileHashes(path)
    val untouchedAfter = after.filter(_._1.startsWith("day=2024-01-03"))
    assert(untouchedAfter == untouchedBefore,
      s"untouched partition rewritten:\n before=$untouchedBefore\n after=$untouchedAfter")
    // touched partitions WERE rewritten (different file names/bytes)
    assert(after.keySet.filter(_.startsWith("day=2024-01-01")) !=
      before.keySet.filter(_.startsWith("day=2024-01-01")))
    // no staging residue
    assert(!Files.list(java.nio.file.Paths.get(path)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_staging_")))
  }

  test("re-running the same batch is idempotent (rows and untouched bytes)") {
    val path = tmp()
    writeBase(path)
    val updates = Seq((1L, 1L, "2024-01-01", 99.0))
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day")
    val rows1 = readFact(path)
    val untouched1 = fileHashes(path).filterNot(_._1.startsWith("day=2024-01-01"))
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day")
    assert(readFact(path) == rows1, "second run changed rows")
    val untouched2 = fileHashes(path).filterNot(_._1.startsWith("day=2024-01-01"))
    assert(untouched2 == untouched1, "second run rewrote untouched partitions")
  }

  test("deletes: matched keys removed, update+delete in one call ends deleted, untouched partitions byte-identical") {
    val path = tmp()
    writeBase(path)
    val before = fileHashes(path)
    val updates = Seq((1L, 1L, "2024-01-01", 99.0), // updated AND deleted
        (9L, 1L, "2024-01-02", 90.0))               // plain insert
      .toDF("order_id", "item_id", "day", "amount")
    val dels = Seq((1L, 1L, "2024-01-01"), (2L, 1L, "2024-01-02"))
      .toDF("order_id", "item_id", "day")
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
      deletes = Some(dels))
    assert(readFact(path) == Set(
      (1L, 2L, "2024-01-01", 11.0),   // survivor in a touched partition
      (9L, 1L, "2024-01-02", 90.0),   // the insert
      (3L, 1L, "2024-01-03", 30.0)))  // untouched partition
    val after = fileHashes(path)
    assert(before.filter(_._1.startsWith("day=2024-01-03")) ==
      after.filter(_._1.startsWith("day=2024-01-03")),
      "untouched partition was rewritten")
    // re-run converges (deletes re-apply idempotently)
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
      deletes = Some(dels))
    assert(readFact(path).size == 3)
  }

  test("deletes that empty a partition remove its directory and its index rows") {
    import graft.sources.StatsIndex
    val root = Files.createTempDirectory("graft-mergeinto-delall").toString
    val (path, idx) = (s"$root/fact", s"$root/idx")
    writeBase(path)
    StatsIndex.save(StatsIndex.build(spark, path), idx)
    // no updates at all: a pure delete batch wiping 2024-01-03
    val dels = Seq((3L, 1L, "2024-01-03")).toDF("order_id", "item_id", "day")
    val empty = Seq.empty[(Long, Long, String, Double)]
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, empty, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx), deletes = Some(dels))
    assert(readFact(path) == baseRows.toSet - ((3L, 1L, "2024-01-03", 30.0)))
    assert(!Files.exists(JPath.of(path, "day=2024-01-03")),
      "emptied partition directory must be removed")
    assert(StatsIndex.load(spark, idx)
      .where(col("file").contains("day=2024-01-03")).count() == 0,
      "emptied partition's index rows must drop")
    // the index still serves the survivors
    assert(StatsIndex.partitionFiles(StatsIndex.load(spark, idx),
      "day", Seq("2024-01-01")).nonEmpty)
  }

  test("partition values needing Hive path escaping: an emptied partition's ESCAPED dir is removed, no resurrect") {
    // Spark writes `%` as `%25` in partition dir names; a raw
    // s"$col=$v" comparison misses the published-set match AND the
    // exists(), so the old generation would survive a full delete and
    // its rows resurrect on the next read (ADVICE r17)
    val path = tmp()
    Seq((1L, 1L, "p%1", 10.0), (2L, 1L, "p%1", 20.0), (3L, 1L, "plain", 30.0))
      .toDF("order_id", "item_id", "day", "amount")
      .repartition(1).write.partitionBy("day").parquet(path)
    assert(Files.exists(JPath.of(path, "day=p%251")),
      "fixture sanity: Spark escaped the dir name")
    val dels = Seq((1L, 1L, "p%1"), (2L, 1L, "p%1"))
      .toDF("order_id", "item_id", "day")
    val empty = Seq.empty[(Long, Long, String, Double)]
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, empty, Seq("order_id", "item_id"), "day",
      deletes = Some(dels))
    assert(!Files.exists(JPath.of(path, "day=p%251")),
      "emptied escaped-name partition directory must be removed")
    assert(readFact(path) == Set((3L, 1L, "plain", 30.0)),
      "deleted rows resurrected from the unescaped-name miss")
  }

  test("deletes probe the blooms: a file holding only a deleted key cannot pass through") {
    import graft.sources.StatsIndex
    val root = Files.createTempDirectory("graft-mergeinto-delbloom").toString
    val (path, idx, bl) = (s"$root/fact", s"$root/idx", s"$root/bloom")
    // one partition, several files, scattered keys
    spark.range(1000).select(col("id").as("order_id"), lit(1L).as("item_id"),
        lit("d0").as("day"), col("id").cast("double").as("amount"))
      .repartition(8).write.partitionBy("day").parquet(path)
    StatsIndex.save(StatsIndex.build(spark, path), idx)
    StatsIndex.saveBlooms(StatsIndex.buildBlooms(spark, path,
      Seq("order_id"), expectedItemsPerFile = 1000), bl)
    val empty = Seq.empty[(Long, Long, String, Double)]
      .toDF("order_id", "item_id", "day", "amount")
    val dels = Seq((123L, 1L, "d0"), (777L, 1L, "d0"))
      .toDF("order_id", "item_id", "day")
    Upsert.mergeInto(path, empty, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx), bloomsPath = Some(bl),
      bloomColumns = Seq("order_id"), deletes = Some(dels))
    val left = spark.read.parquet(path).select("order_id").as[Long].collect()
    assert(left.length == 998 && !left.contains(123L) && !left.contains(777L))
  }

  test("first run with deletes: updates minus deletes land") {
    val path = tmp()
    val updates = Seq((1L, 1L, "2024-01-01", 1.0), (2L, 1L, "2024-01-01", 2.0))
      .toDF("order_id", "item_id", "day", "amount")
    val dels = Seq((1L, 1L, "2024-01-01")).toDF("order_id", "item_id", "day")
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
      deletes = Some(dels))
    assert(readFact(path) == Set((2L, 1L, "2024-01-01", 2.0)))
  }

  test("first run (no table) is a plain partitioned write") {
    val path = tmp()
    val updates = Seq((1L, 1L, "2024-01-01", 10.0), (2L, 1L, "2024-01-02", 20.0))
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day")
    assert(readFact(path) == Set(
      (1L, 1L, "2024-01-01", 10.0), (2L, 1L, "2024-01-02", 20.0)))
  }

  test("a crashed (abandoned) staging dir leaves the table fully readable") {
    val path = tmp()
    writeBase(path)
    // simulate a writer that died between staging write and publish
    val staging = JPath.of(path, "_staging_deadbeef", "day=2024-01-01")
    Files.createDirectories(staging)
    Seq((666L, 666L, 666.0)).toDF("order_id", "item_id", "amount")
      .write.mode("overwrite").parquet(staging.toString)
    // readers never see the staged partial batch ('_'-prefixed dirs are
    // invisible to partition discovery)
    assert(readFact(path) == baseRows.toSet)
    // and a later merge still works, publishing its OWN staging only
    Upsert.mergeInto(path,
      Seq((1L, 1L, "2024-01-01", 99.0)).toDF("order_id", "item_id", "day", "amount"),
      Seq("order_id", "item_id"), "day")
    assert(readFact(path).contains((1L, 1L, "2024-01-01", 99.0)))
    assert(!readFact(path).exists(_._1 == 666L))
  }

  test("merge failure cleans its staging and leaves the table as it was") {
    val path = tmp()
    writeBase(path)
    val before = fileHashes(path)
    // updates whose schema is missing a table column -> selectExpr fails
    val bad = Seq((1L, 1L, "2024-01-01")).toDF("order_id", "item_id", "day")
    intercept[Exception] {
      Upsert.mergeInto(path, bad, Seq("order_id", "item_id"), "day")
    }
    assert(fileHashes(path) == before, "failed merge modified the table")
    assert(!Files.list(java.nio.file.Paths.get(path)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_staging_")),
      "failed merge left staging behind")
  }

  test("only the touched partitions are scanned (partition-pruned read)") {
    val path = tmp()
    writeBase(path)
    // the same pruned read mergeInto issues: the scan must open only the
    // touched partition's files (inputFiles ignores partition filters, so
    // assert on the executed scan's numFiles metric instead)
    val slice = spark.read.parquet(path).where(col("day").isin("2024-01-01"))
    slice.collect()
    val scan = slice.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numFiles").value == 1L,
      s"pruning failed: scanned ${scan.metrics("numFiles").value} files")
  }

  test("index-fed merge: slice files come from the stats index, which stays fresh across merges") {
    import graft.sources.StatsIndex
    val root = Files.createTempDirectory("graft-mergeinto-idx").toString
    val (path, idx, twin) = (s"$root/fact", s"$root/idx", s"$root/twin")
    writeBase(path)
    writeBase(twin)
    StatsIndex.save(StatsIndex.build(spark, path), idx)

    // the index answers the touched-partition file list without a tree walk,
    // and it is EXACTLY those partitions' files — the consumer can read
    // nothing else (the scan is constructed from this list)
    val planned = StatsIndex.partitionFiles(
      StatsIndex.load(spark, idx), "day", Seq("2024-01-01", "2024-01-02"))
    val expected = StatsIndex.listDataFiles(spark, path)
      .filter(f => f.contains("/day=2024-01-01/") || f.contains("/day=2024-01-02/"))
    assert(planned == expected.sorted && planned.nonEmpty)

    val updates = Seq(
      (1L, 1L, "2024-01-01", 99.0),  // update
      (9L, 1L, "2024-01-02", 90.0),  // insert
      (5L, 1L, "2024-01-05", 50.0))  // brand-new partition
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx))
    Upsert.mergeInto(twin, updates, Seq("order_id", "item_id"), "day")
    assert(readFact(path) == readFact(twin),
      "index-fed merge diverged from the listing-based merge")

    // the merge replaced the touched partitions' index rows: the index
    // matches a fresh footer pass over the table, file for file, and
    // names no deleted file
    val after = StatsIndex.load(spark, idx)
      .as[StatsIndex.FileColStats].collect().toSet
    val rebuilt = StatsIndex.build(spark, path)
      .as[StatsIndex.FileColStats].collect().toSet
    assert(after == rebuilt, "index drifted from the table after the merge")

    // and a SECOND index-fed merge over the rewritten partitions works —
    // the freshness the in-call replace exists to guarantee
    val updates2 = Seq((1L, 2L, "2024-01-01", 77.0))
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, updates2, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx))
    Upsert.mergeInto(twin, updates2, Seq("order_id", "item_id"), "day")
    assert(readFact(path) == readFact(twin))
  }

  test("bloom-fed merge: key-free files bypass the merge shuffle, result identical, blooms reconciled") {
    import graft.sources.StatsIndex
    val root = Files.createTempDirectory("graft-mergeinto-bloom").toString
    val (path, idx, bl, twin) = (s"$root/fact", s"$root/idx",
      s"$root/blooms", s"$root/twin")
    // ONE partition, 8 files of SCATTERED order ids: every file spans
    // nearly the full id range, so partition pruning keeps the whole day
    // and min/max keeps every file — the regime the bloom split exists for
    val base = (0L until 800L).map(i => (i, 1L, "2024-01-01", i * 1.0))
      .toDF("order_id", "item_id", "day", "amount").repartition(8)
    base.write.partitionBy("day").parquet(path)
    base.write.partitionBy("day").parquet(twin)
    StatsIndex.save(StatsIndex.build(spark, path), idx)
    StatsIndex.saveBlooms(StatsIndex.buildBlooms(spark, path,
      Seq("order_id"), expectedItemsPerFile = 1000), bl)

    val updates = Seq(
      (412L, 1L, "2024-01-01", 9999.0), // update: lives in exactly one file
      (801L, 1L, "2024-01-01", 8.0))    // insert: in no file's bloom
      .toDF("order_id", "item_id", "day", "amount")

    // min/max is useless: every file survives the point range probe
    val files = StatsIndex.partitionFiles(
      StatsIndex.load(spark, idx), "day", Seq("2024-01-01"))
    assert(files.size == 8, s"fixture: want 8 files, got ${files.size}")
    assert(StatsIndex.pruneFiles(StatsIndex.load(spark, idx),
      Map("order_id" -> (412.0, 412.0))).size == 8)
    // the bloom split is MEASURABLE: ≤ 3 of 8 files enter the merge
    // (1 owning file + ≤ fpp-level false positives), the rest pass through
    val (mrg, pass) = Upsert.splitByBlooms(spark, files, updates,
      Some(bl), Seq("order_id"), 100000)
    assert(mrg.size + pass.size == 8)
    assert(mrg.size <= 3, s"bloom split ineffective: ${mrg.size} of 8 merge")

    def rows(p: String) = spark.read.parquet(p)
      .select("order_id", "item_id", "day", "amount")
      .as[(Long, Long, String, Double)].collect().toSet
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx), bloomsPath = Some(bl),
      bloomColumns = Seq("order_id"))
    Upsert.mergeInto(twin, updates, Seq("order_id", "item_id"), "day")
    assert(rows(path) == rows(twin),
      "bloom-fed merge diverged from the listing-based merge")

    // the publish reconciled the bloom index with the rewritten partition
    assert(StatsIndex.loadBlooms(spark, bl).select("file").distinct()
        .as[String].collect().toSet
      == StatsIndex.listDataFiles(spark, path).toSet,
      "bloom index lags the table after the merge publish")

    // a SECOND bloom-fed merge over the rewritten files stays exact
    val u2 = Seq((3L, 1L, "2024-01-01", 7.0))
      .toDF("order_id", "item_id", "day", "amount")
    Upsert.mergeInto(path, u2, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx), bloomsPath = Some(bl),
      bloomColumns = Seq("order_id"))
    Upsert.mergeInto(twin, u2, Seq("order_id", "item_id"), "day")
    assert(rows(path) == rows(twin))
  }

  test("null merge-key updates: bloom split stands down, bloom-fed == listing merge") {
    import graft.sources.StatsIndex
    val root = Files.createTempDirectory("graft-mergeinto-nullkey").toString
    val (path, idx, bl, twin) = (s"$root/fact", s"$root/idx",
      s"$root/blooms", s"$root/twin")
    val base = (0L until 100L).map(i => (i, 1L, "2024-01-01", i * 1.0))
      .toDF("order_id", "item_id", "day", "amount").repartition(4)
    base.write.partitionBy("day").parquet(path)
    base.write.partitionBy("day").parquet(twin)
    StatsIndex.save(StatsIndex.build(spark, path), idx)
    StatsIndex.saveBlooms(StatsIndex.buildBlooms(spark, path,
      Seq("order_id"), expectedItemsPerFile = 1000), bl)

    // one real update + one NULL-key row: blooms cannot represent null
    // (the build skips nulls), so the only sound split is NO split
    val updates = Seq[(Option[Long], Long, String, Double)](
      (Some(7L), 1L, "2024-01-01", 999.0),
      (None, 1L, "2024-01-01", 5.0))
      .toDF("order_id", "item_id", "day", "amount")
    val files = StatsIndex.partitionFiles(
      StatsIndex.load(spark, idx), "day", Seq("2024-01-01"))
    val (mrg, pass) = Upsert.splitByBlooms(spark, files, updates,
      Some(bl), Seq("order_id"), 100000)
    assert(pass.isEmpty && mrg.toSet == files.toSet,
      "a null probe value must disable the split: nothing may pass through")

    def rows(p: String) = spark.read.parquet(p)
      .select("order_id", "item_id", "day", "amount")
      .as[(Option[Long], Long, String, Double)].collect().toSet
    Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
      statsIndexPath = Some(idx), bloomsPath = Some(bl),
      bloomColumns = Seq("order_id"))
    Upsert.mergeInto(twin, updates, Seq("order_id", "item_id"), "day")
    assert(rows(path) == rows(twin),
      "null-key bloom-fed merge diverged from the listing-based merge")
    assert(rows(path).exists(_._1.isEmpty), "null-key row must land")
    assert(rows(path).contains((Some(7L), 1L, "2024-01-01", 999.0)))
  }

  test("index-fed merge refuses a stale index instead of dropping partition rows") {
    import graft.sources.StatsIndex
    val root = Files.createTempDirectory("graft-mergeinto-stale").toString
    val (path, idx) = (s"$root/fact", s"$root/idx")
    writeBase(path)
    // index built over a DIFFERENT (empty) table: it names no files for
    // the touched, existing partitions — merging through it would read an
    // empty slice and overwrite jan-01 with only the updates
    val emptyTable = s"$root/empty"
    (1 to 3).map(i => (i.toLong, i.toLong, "2024-09-09", 1.0))
      .toDF("order_id", "item_id", "day", "amount")
      .write.partitionBy("day").parquet(emptyTable)
    StatsIndex.save(StatsIndex.build(spark, emptyTable), idx)
    val updates = Seq((1L, 1L, "2024-01-01", 99.0))
      .toDF("order_id", "item_id", "day", "amount")
    val before = readFact(path)
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeInto(path, updates, Seq("order_id", "item_id"), "day",
        statsIndexPath = Some(idx))
    }
    assert(e.getMessage.contains("names no files for existing partition"))
    assert(readFact(path) == before, "failed merge must leave the table as it was")
  }

  test("guards: partitionCol as key, null partition values") {
    val path = tmp()
    writeBase(path)
    val updates = Seq((1L, 1L, "2024-01-01", 1.0))
      .toDF("order_id", "item_id", "day", "amount")
    intercept[IllegalArgumentException] {
      Upsert.mergeInto(path, updates, Seq("order_id", "day"), "day")
    }
    val nullDay = Seq((1L, 1L, null.asInstanceOf[String], 1.0))
      .toDF("order_id", "item_id", "day", "amount")
    intercept[IllegalArgumentException] {
      Upsert.mergeInto(path, nullDay, Seq("order_id", "item_id"), "day")
    }
  }

  test("versioned bloom merge: key-free files survive the manifest unrewritten; reads auto-probe the generation's blooms") {
    import graft.sources.{IndexedScan, StatsIndex}
    val root = Files.createTempDirectory("graft-vmerge-bloom").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    // ONE partition, 8 files of SCATTERED ids — min/max pruning useless,
    // the bloom split's regime (the in-place twin test's fixture)
    val base = (0L until 800L).map(i => (i, 1L, "2024-01-01", i * 1.0))
      .toDF("order_id", "item_id", "day", "amount").repartition(8)
    val g1 = Upsert.mergeIntoVersionedCols(path, base,
      Seq("order_id", "item_id"), Seq("day"), idx,
      bloomColumns = Seq("order_id"))
    val g1Files = StatsIndex.load(spark, s"$idx/_v=$g1")
      .select("file").distinct().as[String].collect().toSet
    assert(g1Files.size == 8, s"fixture: want 8 files, got ${g1Files.size}")
    assert(StatsIndex.generationBlooms(spark, idx, g1).isDefined)

    // point update: ONE owning file (+ fpp-level false positives) is
    // rewritten; every key-free file SURVIVES in the new manifest —
    // copy-on-write means they are not even rewritten, unlike in-place
    val updates = Seq((412L, 1L, "2024-01-01", 9999.0),
        (801L, 1L, "2024-01-01", 8.0))
      .toDF("order_id", "item_id", "day", "amount")
    val g2 = Upsert.mergeIntoVersionedCols(path, updates,
      Seq("order_id", "item_id"), Seq("day"), idx,
      bloomColumns = Seq("order_id"))
    val g2Files = StatsIndex.load(spark, s"$idx/_v=$g2")
      .select("file").distinct().as[String].collect().toSet
    val survived = (g1Files intersect g2Files).size
    assert(survived >= 5, s"bloom pass-through ineffective: only " +
      s"$survived of 8 pre-merge files survived the manifest")

    // result identical to the latest-wins contract
    val got = IndexedScan.readIndexedVersioned(spark, path, idx)
      .select(col("order_id").cast("long"), col("amount").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(got.size == 801 && got(412L) == 9999.0 && got(801L) == 8.0 &&
      got(3L) == 3.0)

    // the committed bloom relation covers the WHOLE manifest (carried
    // survivors + fresh files) and rides reads automatically: a point
    // lookup's scan opens ≤ 3 of the 9 manifest files
    val blooms = StatsIndex.generationBlooms(spark, idx, g2).get
    assert(blooms.select("file").distinct().as[String].collect().toSet
      == g2Files, "bloom relation does not cover the manifest")
    val probe = IndexedScan.readIndexedVersioned(spark, path, idx)
      .where(col("order_id") === 13L)
    probe.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
    val nFiles = scans(probe.queryExecution.executedPlan)
      .head.metrics("numFiles").value
    assert(nFiles <= 3, s"auto bloom probe ineffective: $nFiles files scanned")

    // a bloom-LESS merge keeps coverage for surviving files (carried),
    // new files stay unknown-kept — results stay exact either way
    val g3 = Upsert.mergeIntoVersionedCols(path,
      Seq((900L, 1L, "2024-01-02", 90.0))
        .toDF("order_id", "item_id", "day", "amount"),
      Seq("order_id", "item_id"), Seq("day"), idx)
    val b3 = StatsIndex.generationBlooms(spark, idx, g3)
    assert(b3.isDefined, "carried blooms dropped by a bloom-less merge")
    assert(IndexedScan.readIndexedVersioned(spark, path, idx).count() == 802)
  }
}
