package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.StatsIndex

/** Time travel + change data feed over the versioned manifest
  * ([[ChangeFeed]]): `asOf` pins any retained generation, `between`
  * emits the keyed SnapshotDiff of two generations restricted to the
  * partitions whose file manifests changed — and that restriction must
  * be REAL (untouched partitions' files never enter the read) without
  * ever changing the answer. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame) = df
    .select(col("order_id").cast("long"), col("day").cast("string"),
      col("amount").cast("double"))
    .as[(Long, String, Double)].collect().toSet

  private val base = Seq(
    (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
    (3L, "2024-01-02", 30.0), (4L, "2024-01-03", 40.0))

  test("asOf reads each generation; between emits exactly the change rows of the hop") {
    val root = Files.createTempDirectory("graft-cf").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val g1 = Upsert.mergeIntoVersioned(path,
      base.toDF("order_id", "day", "amount"), Seq("order_id"), "day", idx)
    // gen2: update key 2, insert key 5 (new partition), delete key 4
    // (empties its partition)
    val g2 = Upsert.mergeIntoVersioned(path,
      Seq((2L, "2024-01-01", 99.0), (5L, "2024-01-04", 50.0))
        .toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx,
      deletes = Some(Seq((4L, "2024-01-03")).toDF("order_id", "day")))

    assert(rows(ChangeFeed.asOf(spark, path, idx, g1)) == base.toSet)
    assert(rows(ChangeFeed.asOf(spark, path, idx, g2)) == Set(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 99.0),
      (3L, "2024-01-02", 30.0), (5L, "2024-01-04", 50.0)))

    // pruning is real: only the merged/inserted/emptied partitions'
    // file sets changed — day=2024-01-02 never enters the hop
    val sa = StatsIndex.load(spark, s"$idx/_v=$g1")
    val sb = StatsIndex.load(spark, s"$idx/_v=$g2")
    assert(ChangeFeed.changedPartitions(spark, sa, sb, "day") ==
      Seq("2024-01-01", "2024-01-03", "2024-01-04"))

    val feed = ChangeFeed.between(spark, path, idx, g1, g2,
        Seq("order_id"), "day")
      .select(col("op"), col("order_id").cast("long"),
        col("b_amount").cast("double"), col("a_amount").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(feed == Set(
      ("update", 2L, 20.0, 99.0),
      ("insert", 5L, null, 50.0),
      ("delete", 4L, 40.0, null)))

    // a rewrite that lands IDENTICAL values still flips a generation
    // (files are new) but must feed ZERO change rows
    val g3 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "2024-01-01", 10.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    assert(g3 == g2 + 1)
    assert(ChangeFeed.between(spark, path, idx, g2, g3,
      Seq("order_id"), "day").isEmpty)

    // column projection: payload restricted to the named columns
    val projected = ChangeFeed.between(spark, path, idx, g1, g2,
      Seq("order_id"), "day", columns = Seq("amount"))
    assert(projected.columns.toSeq ==
      Seq("op", "order_id", "b_day", "a_day", "b_amount", "a_amount"))

    // vacuum against the latest generation reaps replaced files → a
    // pinned old generation becomes unreadable by construction; asOf
    // must then throw rather than silently return partial data
    StatsIndex.vacuum(spark, path,
      StatsIndex.loadLatest(spark, s"$idx"), graceMs = 0L)
    val e = intercept[Exception](
      ChangeFeed.asOf(spark, path, idx, g1).collect())
    assert(e != null)
  }

  test("append-only hop diffs only the new partition — the from side reads ZERO files") {
    val root = Files.createTempDirectory("graft-cf-app").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val g1 = Upsert.mergeIntoVersioned(path,
      base.toDF("order_id", "day", "amount"), Seq("order_id"), "day", idx)
    // the daily-ingest hop: one brand-new partition, nothing else touched
    val g2 = Upsert.mergeIntoVersioned(path,
      Seq((7L, "2024-01-07", 70.0), (8L, "2024-01-07", 80.0))
        .toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)

    val sa = StatsIndex.load(spark, s"$idx/_v=$g1")
    val sb = StatsIndex.load(spark, s"$idx/_v=$g2")
    val touched = ChangeFeed.changedPartitionValues(spark, sa, sb, Seq("day"))
    assert(touched == Seq(Seq("2024-01-07")))
    // the restricted from-slice is FILE-EMPTY: the hop must not fall back
    // to the full manifests
    assert(ChangeFeed.restrictToTouched(sa, Seq("day"), touched)
      .select("file").isEmpty)

    // behavioral proof that no fallback reads the untouched partitions:
    // delete every pre-hop data file from disk — a full-manifest read
    // (the old fallback) would crash on the missing files; the
    // slice-restricted diff never opens them
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    sa.select("file").collect().map(_.getString(0)).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false))
    val feed = ChangeFeed.between(spark, path, idx, g1, g2,
        Seq("order_id"), "day")
      .select(col("op"), col("order_id").cast("long"),
        col("a_amount").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(feed == Set(("insert", 7L, 70.0), ("insert", 8L, 80.0)))
  }

  test("a delete-all merge commits a file-empty generation that stays readable and CDC-traversable") {
    val root = Files.createTempDirectory("graft-cf-empty").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val two = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
    val g1 = Upsert.mergeIntoVersioned(path,
      two.toDF("order_id", "day", "amount"), Seq("order_id"), "day", idx)
    import org.apache.spark.sql.functions.lit
    val g2 = Upsert.mergeIntoVersioned(path,
      two.toDF("order_id", "day", "amount").where(lit(false)),
      Seq("order_id"), "day", idx,
      deletes = Some(two.toDF("order_id", "day", "amount")
        .select("order_id", "day")))

    // the empty generation answers as the empty relation under the
    // recorded schema (+ partition column), not an error
    val empty = ChangeFeed.asOf(spark, path, idx, g2)
    assert(empty.columns.toSeq == Seq("order_id", "amount", "day"))
    assert(empty.isEmpty)

    // hop INTO the empty generation: every row a delete
    val intoIt = ChangeFeed.between(spark, path, idx, g1, g2,
        Seq("order_id"), "day")
      .select(col("op"), col("order_id").cast("long"))
      .as[(String, Long)].collect().toSet
    assert(intoIt == Set(("delete", 1L), ("delete", 2L)))

    // hop OUT of it: re-inserts read as inserts — a follower never wedges
    val g3 = Upsert.mergeIntoVersioned(path,
      Seq((9L, "2024-01-09", 90.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    val outOf = ChangeFeed.between(spark, path, idx, g2, g3,
        Seq("order_id"), "day")
      .select(col("op"), col("order_id").cast("long"))
      .as[(String, Long)].collect().toSet
    assert(outOf == Set(("insert", 9L)))
  }

  test("changedPartitionValues extracts multi-level tuples, quoted-metachar columns, and escaped values") {
    import spark.implicits._
    def stats(files: String*) = files.toSeq.toDF("file")
    val a = stats(
      "file:/t/d=2024-01-01/b.id=1/f1.parquet",
      "file:/t/d=2024-01-02/b.id=1/f2.parquet")
    val b = stats(
      "file:/t/d=2024-01-01/b.id=1/f1.parquet", // shared: untouched
      "file:/t/d=2024-01-02/b.id=1/f2b.parquet", // replaced
      "file:/t/d=2024-01-03/b.id=2/f3.parquet") // new
    // `b.id` contains a regex metachar — Pattern.quote keeps it literal
    assert(ChangeFeed.changedPartitionValues(spark, a, b, Seq("d", "b.id")) ==
      Seq(Seq("2024-01-02", "1"), Seq("2024-01-03", "2")))
    // Hive-escaped partition values unescape on the way out
    val esc = stats("file:/t/k=a%3Ab/f.parquet")
    assert(ChangeFeed.changedPartitionValues(spark, esc, stats(), Seq("k")) ==
      Seq(Seq("a:b")))
  }
}
