package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd2

/** [[Scd2Stream]]: continuous SCD2 maintenance must equal the batch
  * full-history rebuild EXACTLY — including under out-of-order arrival,
  * where a late event inserts a version mid-history and resurrects an
  * observation previously collapsed as a non-change (the case no
  * current-row-only MERGE can reproduce). */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The full CDC feed, in ARRIVAL order, as (batch -> rows). Key 7 is the
    * adversarial case: its batch-2 event lands between two already-seen
    * observations with a brand-new value, so the correct final history
    * re-splits around it — observation (Jan 3, "A"), originally collapsed
    * as a non-change after (Jan 1, "A"), becomes a change row again. */
  private val batches: Seq[Seq[(Long, Timestamp, String, Double)]] = Seq(
    Seq(
      (7L, ts("2024-01-01 10:00:00"), "A", 1.0),
      (7L, ts("2024-01-03 10:00:00"), "A", 2.0),
      (7L, ts("2024-01-05 10:00:00"), "B", 3.0),
      (1L, ts("2024-01-01 09:00:00"), "bronze", 10.0),
      (2L, ts("2024-01-01 09:30:00"), "silver", 20.0),
      (3L, ts("2024-01-02 09:00:00"), "bronze", 30.0)),
    Seq(
      (1L, ts("2024-01-04 09:00:00"), "gold", 11.0),
      (2L, ts("2024-01-03 09:30:00"), "silver", 21.0), // non-change
      (4L, ts("2024-01-03 12:00:00"), "bronze", 40.0)),
    Seq(
      (7L, ts("2024-01-02 10:00:00"), "Z", 4.0), // LATE: mid-history insert
      (3L, ts("2024-01-01 08:00:00"), "gold", 31.0), // LATE: pre-history
      (5L, ts("2024-01-05 15:00:00"), "silver", 50.0)),
    Seq(
      (1L, ts("2024-01-06 09:00:00"), "bronze", 12.0),
      (6L, ts("2024-01-06 10:00:00"), "gold", 60.0)))

  private def feedDf(rows: Seq[(Long, Timestamp, String, Double)]): DataFrame =
    rows.toDF("cust_id", "ts", "segment", "value")

  private val dimCols =
    Seq("cust_id", "segment", "effective_ts", "expiration_ts", "is_current", "version", "sk")

  private def keyRows(df: DataFrame) =
    df.select(dimCols.head, dimCols.tail: _*)
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Int, Long)]
      .collect().toSet

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

  test("streamed out-of-order CDC feed == batch full-history rebuild, exactly") {
    implicit val sq = spark.sqlContext
    val raw = Files.createTempDirectory("graft-scd2s-raw").toString
    val dim = Files.createTempDirectory("graft-scd2s-dim").toString + "/dim"
    val ckpt = Files.createTempDirectory("graft-scd2s-ckpt").toString

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val stream = mem.toDF().toDF("cust_id", "ts", "segment", "value")
    val q = Scd2Stream.run(stream, raw, dim, ckpt,
      key = "cust_id", ts = "ts", tracked = "segment", nBuckets = 8)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = keyRows(Scd2Stream.readDim(spark, dim))
    val want = keyRows(Scd2.fromHistory(
      feedDf(batches.flatten), "cust_id", "ts", "segment"))
    assert(got == want)

    // the adversarial key's final history: the late Z event split A's run
    val k7 = got.filter(_._1 == 7L).toSeq.sortBy(_._6)
      .map(r => (r._2, r._3, r._5))
    assert(k7 == Seq(
      ("A", ts("2024-01-01 10:00:00"), false),
      ("Z", ts("2024-01-02 10:00:00"), false),
      ("A", ts("2024-01-03 10:00:00"), false), // resurrected non-change
      ("B", ts("2024-01-05 10:00:00"), true)))
  }

  test("applyBatch rewrites only touched buckets; replay is idempotent") {
    val raw = Files.createTempDirectory("graft-scd2s-raw2").toString
    val dim = Files.createTempDirectory("graft-scd2s-dim2").toString + "/dim"

    Scd2Stream.applyBatch(feedDf(batches.head), 0L, raw, dim,
      "cust_id", "ts", "segment", nBuckets = 4)
    val before = fileHashes(dim)

    // a single-key batch touches exactly one bucket
    val single = Seq((2L, ts("2024-01-07 09:00:00"), "gold", 22.0))
    val bucket = feedDf(single)
      .select(Scd2Stream.bucketOf(col("cust_id"), 4)).head().getLong(0)
    Scd2Stream.applyBatch(feedDf(single), 1L, raw, dim,
      "cust_id", "ts", "segment", nBuckets = 4)
    val after = fileHashes(dim)

    val untouchedBefore = before.filterNot(_._1.startsWith(s"_kb=$bucket"))
    val untouchedAfter = after.filterNot(_._1.startsWith(s"_kb=$bucket"))
    assert(untouchedBefore == untouchedAfter) // byte-identical, never rewritten
    assert(before.keys.exists(_.startsWith(s"_kb=$bucket")) ||
      after.keys.exists(_.startsWith(s"_kb=$bucket")))

    // crash-replay of the same batch id converges to the same dimension
    val once = keyRows(Scd2Stream.readDim(spark, dim))
    Scd2Stream.applyBatch(feedDf(single), 1L, raw, dim,
      "cust_id", "ts", "segment", nBuckets = 4)
    assert(keyRows(Scd2Stream.readDim(spark, dim)) == once)

    // and the maintained dim equals the full rebuild of everything landed
    val want = keyRows(Scd2.fromHistory(
      feedDf(batches.head ++ single), "cust_id", "ts", "segment"))
    assert(once == want)
  }

  test("log compaction: compacted-log rebuild == full-log rebuild on the adversarial feed") {
    val raw = Files.createTempDirectory("graft-scd2s-raw3").toString
    val dim = Files.createTempDirectory("graft-scd2s-dim3").toString + "/dim"
    batches.zipWithIndex.foreach { case (b, i) =>
      Scd2Stream.applyBatch(feedDf(b), i.toLong, raw, dim,
        "cust_id", "ts", "segment", nBuckets = 4)
    }
    val want = keyRows(Scd2.fromHistory(
      feedDf(batches.flatten), "cust_id", "ts", "segment"))
    val rowsBefore = spark.read.parquet(raw).count()

    Scd2Stream.compactBuckets(spark, raw, 0L until 4L,
      "cust_id", "ts", "segment")

    // the log shrank (the duplicate/non-change observations are gone) and
    // every bucket collapsed to the single compacted batch partition
    val after = spark.read.parquet(raw)
    assert(after.count() < rowsBefore)
    assert(after.select(col("_batch_id").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(Scd2Stream.CompactedBatchId))

    // a rebuild from the compacted log is EXACTLY the full-log rebuild
    val rebuilt = keyRows(Scd2.fromHistory(
      after.drop("_batch_id", "_kb"), "cust_id", "ts", "segment"))
    assert(rebuilt == want)

    // and the maintained dim keeps matching across a post-compaction batch
    val more = Seq((1L, ts("2024-01-08 09:00:00"), "silver", 13.0))
    Scd2Stream.applyBatch(feedDf(more), 4L, raw, dim,
      "cust_id", "ts", "segment", nBuckets = 4)
    assert(keyRows(Scd2Stream.readDim(spark, dim)) ==
      keyRows(Scd2.fromHistory(feedDf(batches.flatten ++ more),
        "cust_id", "ts", "segment")))

    // pre-compaction batch-id replay after compaction still converges
    Scd2Stream.applyBatch(feedDf(batches(1)), 1L, raw, dim,
      "cust_id", "ts", "segment", nBuckets = 4)
    assert(keyRows(Scd2Stream.readDim(spark, dim)) ==
      keyRows(Scd2.fromHistory(feedDf(batches.flatten ++ more),
        "cust_id", "ts", "segment")))
  }

  test("watermarked compaction keeps resurrectable rows; unguarded compaction documents the loss") {
    // key 7 after batch 0 alone: A@Jan1, A@Jan3 (non-change), B@Jan5.
    // The late Z@Jan2 in batch 2 must RESURRECT A@Jan3 — so a compaction
    // that ran before Z arrived may only drop observations at or below a
    // watermark that bounds lateness.
    def land(raw: String, dim: String, b: Seq[(Long, Timestamp, String, Double)],
             id: Long): Unit =
      Scd2Stream.applyBatch(feedDf(b), id, raw, dim,
        "cust_id", "ts", "segment", nBuckets = 4)
    val late = Seq((7L, ts("2024-01-02 10:00:00"), "Z", 4.0))

    // watermark Jan 2 00:00 < the non-change A@Jan3 → A@Jan3 survives
    val raw1 = Files.createTempDirectory("graft-scd2s-raw4").toString
    val dim1 = Files.createTempDirectory("graft-scd2s-dim4").toString + "/dim"
    land(raw1, dim1, batches.head, 0L)
    Scd2Stream.compactBuckets(spark, raw1, 0L until 4L,
      "cust_id", "ts", "segment",
      watermark = Some(lit(ts("2024-01-02 00:00:00"))))
    land(raw1, dim1, late, 1L)
    val k7 = keyRows(Scd2Stream.readDim(spark, dim1))
      .filter(_._1 == 7L).toSeq.sortBy(_._6).map(r => (r._2, r._3))
    assert(k7 == Seq(
      ("A", ts("2024-01-01 10:00:00")),
      ("Z", ts("2024-01-02 10:00:00")),
      ("A", ts("2024-01-03 10:00:00")), // resurrected — the watermark kept it
      ("B", ts("2024-01-05 10:00:00"))))

    // no watermark: A@Jan3 is compacted away, and the late Z then loses it
    // (the documented bounded-lateness bargain — this pins the contract)
    val raw2 = Files.createTempDirectory("graft-scd2s-raw5").toString
    val dim2 = Files.createTempDirectory("graft-scd2s-dim5").toString + "/dim"
    land(raw2, dim2, batches.head, 0L)
    Scd2Stream.compactBuckets(spark, raw2, 0L until 4L,
      "cust_id", "ts", "segment")
    land(raw2, dim2, late, 1L)
    val k7lost = keyRows(Scd2Stream.readDim(spark, dim2))
      .filter(_._1 == 7L).toSeq.sortBy(_._6).map(_._2)
    assert(k7lost == Seq("A", "Z", "B")) // A@Jan3 version gone
  }

  test("auto-compaction policy: long feed keeps the raw/version ratio bounded, no manual call") {
    val raw = Files.createTempDirectory("graft-scd2s-auto").toString
    val dim = Files.createTempDirectory("graft-scd2s-autod").toString + "/dim"
    val pol = Scd2Stream.CompactionPolicy(
      ratio = 2.0, minRawRows = 4, lateness = "30 minutes")
    // 25 hourly batches over 4 keys; a key's segment changes only every
    // 5th batch -> 80% of the log is non-change traffic, so without
    // compaction raw/versions grows toward 5x and keeps growing
    val base = ts("2024-02-01 00:00:00").getTime
    val feed: Seq[Seq[(Long, Timestamp, String, Double)]] =
      (0 until 25).map { i =>
        (1L to 4L).map { k =>
          (k, new Timestamp(base + i * 3600L * 1000L),
            s"seg-$k-${i / 5}", i.toDouble)
        }
      }
    feed.zipWithIndex.foreach { case (b, i) =>
      Scd2Stream.applyBatch(feedDf(b), i.toLong, raw, dim,
        "cust_id", "ts", "segment", nBuckets = 4, compaction = Some(pol))
      // the policy's bound, checked CONTINUOUSLY: raw never exceeds
      // ratio x versions by more than the not-yet-droppable tail (rows
      // inside the lateness window) plus the batch that tripped the check
      val rawCnt = spark.read.parquet(raw).count()
      val verCnt = spark.read.parquet(dim).count()
      assert(rawCnt <= pol.ratio * verCnt + 2 * b.size,
        s"batch $i: raw=$rawCnt versions=$verCnt — ratio unbounded")
    }
    // compaction actually fired: the final log is far below the 100 fed
    // rows (an uncompacted log keeps all of them)
    val finalRaw = spark.read.parquet(raw).count()
    assert(finalRaw < 50, s"auto-compaction never fired: raw=$finalRaw of 100")
    // and the policy cost zero exactness: dim == batch full-feed rebuild
    assert(keyRows(Scd2Stream.readDim(spark, dim)) ==
      keyRows(Scd2.fromHistory(feedDf(feed.flatten),
        "cust_id", "ts", "segment")))
    // a late-but-in-bound arrival (20 min behind max) after many
    // compactions still lands exactly
    val lateTs = new Timestamp(base + 24 * 3600L * 1000L - 20L * 60L * 1000L)
    val late = Seq((2L, lateTs, "late-seg", 99.0))
    Scd2Stream.applyBatch(feedDf(late), 25L, raw, dim,
      "cust_id", "ts", "segment", nBuckets = 4, compaction = Some(pol))
    assert(keyRows(Scd2Stream.readDim(spark, dim)) ==
      keyRows(Scd2.fromHistory(feedDf(feed.flatten ++ late),
        "cust_id", "ts", "segment")))
  }

  test("missing column fails loudly up front") {
    val e = intercept[IllegalArgumentException] {
      Scd2Stream.applyBatch(feedDf(batches.head).drop("segment"), 0L,
        "/tmp/x", "/tmp/y", "cust_id", "ts", "segment")
    }
    assert(e.getMessage.contains("batch missing"))
  }

  test("reserved columns are refused, never silently overwritten") {
    import org.apache.spark.sql.functions.lit
    val kb = intercept[IllegalArgumentException] {
      Scd2Stream.applyBatch(feedDf(batches.head).withColumn("_kb", lit(1)),
        0L, "/tmp/x", "/tmp/y", "cust_id", "ts", "segment")
    }
    assert(kb.getMessage.contains("'_kb'"))
    val bid = intercept[IllegalArgumentException] {
      StreamSink.writeBatch(
        feedDf(batches.head).withColumn("_batch_id", lit(9)), 0L, "/tmp/x", "ts")
    }
    assert(bid.getMessage.contains("'_batch_id'"))
    val key = intercept[IllegalArgumentException] {
      SketchStream.writeBatch(feedDf(batches.head), 0L, "/tmp/x",
        keys = Seq("_batch_id"), distinctCols = Seq("segment"))
    }
    assert(key.getMessage.contains("'_batch_id'"))
  }
}
