package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Upsert

/** Generation-follower CDC delivery ([[ChangeFeedStream]]): every
  * committed hop delivered exactly once in order, cursor advanced per
  * acknowledged hop, replays idempotent through the `_from_gen`
  * partition overwrite. */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  test("drain: bootstrap registers latest, hops deliver in order once, replay is idempotent, vacuumed cursor refuses") {
    val root = Files.createTempDirectory("graft-cfs").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val (cursor, out) = (s"$root/cursor", s"$root/feed")

    val g1 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 10.0), (2L, "d2", 20.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)

    // bootstrap: no cursor → nothing delivered, cursor pinned to latest
    assert(ChangeFeedStream.drainTo(spark, path, idx,
      Seq("order_id"), "day", cursor, out) == 0)
    assert(ChangeFeedStream.readCursor(spark, cursor).contains(g1))

    // two merges → two pending hops, delivered oldest-first in one drain
    val g2 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 11.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    val g3 = Upsert.mergeIntoVersioned(path,
      Seq((3L, "d3", 30.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Set[(String, Long)])]()
    assert(ChangeFeedStream.drain(spark, path, idx,
      Seq("order_id"), "day", cursor) { (f, t, ch) =>
      seen += ((f, t, ch.select(col("op"), col("order_id").cast("long"))
        .as[(String, Long)].collect().toSet))
    } == 2)
    assert(seen.toSeq == Seq(
      (g1, g2, Set(("update", 1L))),
      (g2, g3, Set(("insert", 3L)))))
    assert(ChangeFeedStream.readCursor(spark, cursor).contains(g3))

    // drained: nothing pending
    assert(ChangeFeedStream.drain(spark, path, idx,
      Seq("order_id"), "day", cursor)((_, _, _) => fail("no hop expected")) == 0)

    // landed delivery + replay idempotency: rewind the cursor (the
    // crash-between-handler-and-ack shape) — the re-drain rewrites the
    // same _from_gen partitions, output identical
    assert(ChangeFeedStream.drainTo(spark, path, idx,
      Seq("order_id"), "day", cursor, out, startAt = Some(g1)) == 0)
    ChangeFeedStream.drainTo(spark, path, idx,
      Seq("order_id"), "day", s"$root/cursor2", out, startAt = Some(g1))
    val once = spark.read.parquet(out)
      .select("_from_gen", "op", "order_id").as[(Long, String, Long)]
      .collect().sorted.toSeq
    ChangeFeedStream.drainTo(spark, path, idx,
      Seq("order_id"), "day", s"$root/cursor3", out, startAt = Some(g1))
    val twice = spark.read.parquet(out)
      .select("_from_gen", "op", "order_id").as[(Long, String, Long)]
      .collect().sorted.toSeq
    assert(once == twice && once ==
      Seq((g1, "update", 1L), (g2, "insert", 3L)))

    // follower that fell behind retention refuses loudly
    graft.sources.StatsIndex.vacuumGenerations(spark, idx, keep = 1)
    val e = intercept[IllegalArgumentException] {
      ChangeFeedStream.drain(spark, path, idx,
        Seq("order_id"), "day", s"$root/cursor4",
        startAt = Some(g1))((_, _, _) => ())
    }
    assert(e.getMessage.contains("retained") || e.getMessage.contains("retention"))
  }

  test("a delete-all hop never wedges the follower: the empty generation drains and the cursor advances past it") {
    val root = Files.createTempDirectory("graft-cfs-empty").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val cursor = s"$root/cursor"
    val g1 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 10.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    // delete-all → a legal FILE-EMPTY generation, then a re-insert
    Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 10.0)).toDF("order_id", "day", "amount").where(lit(false)),
      Seq("order_id"), "day", idx,
      deletes = Some(Seq((1L, "d1")).toDF("order_id", "day")))
    val g3 = Upsert.mergeIntoVersioned(path,
      Seq((2L, "d2", 20.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    val seen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    assert(ChangeFeedStream.drain(spark, path, idx,
      Seq("order_id"), "day", cursor, startAt = Some(g1)) { (_, _, ch) =>
      seen ++= ch.select(col("op"), col("order_id").cast("long"))
        .as[(String, Long)].collect()
    } == 2)
    assert(seen.toSet == Set(("delete", 1L), ("insert", 2L)))
    assert(ChangeFeedStream.readCursor(spark, cursor).contains(g3))
  }

  test("replicateTo materializes a versioned table downstream; at-least-once re-delivery converges") {
    val root = Files.createTempDirectory("graft-cfs-repl").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val (cursor, downstream) = (s"$root/cursor", s"$root/replica")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("order_id").cast("long"), col("day").cast("string"),
        col("amount").cast("double"))
      .as[(Long, String, Double)].collect().toSet

    val g1 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 30.0))
        .toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    // seed the replica with the base snapshot, follow from g1
    graft.operators.ChangeFeed.asOf(spark, path, idx, g1)
      .write.partitionBy("day").parquet(downstream)

    // an update, an insert into a NEW partition, and a delete
    Upsert.mergeIntoVersioned(path,
      Seq((2L, "d1", 99.0), (4L, "d3", 40.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    Upsert.mergeIntoVersioned(path,
      Seq((5L, "d2", 50.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx,
      deletes = Some(Seq((1L, "d1")).toDF("order_id", "day")))
    assert(ChangeFeedStream.replicateTo(spark, path, idx,
      Seq("order_id"), "day", cursor, downstream, startAt = Some(g1)) == 2)

    val want = rows(graft.sources.IndexedScan.readIndexedVersioned(spark, path, idx))
    assert(rows(spark.read.parquet(downstream)) == want,
      "replica diverged from the source's latest snapshot")

    // at-least-once: rewind the cursor (crash between apply and ack) —
    // the re-applied hops must converge, not double-apply
    assert(ChangeFeedStream.replicateTo(spark, path, idx,
      Seq("order_id"), "day", s"$root/cursor2", downstream,
      startAt = Some(g1)) == 2)
    assert(rows(spark.read.parquet(downstream)) == want,
      "re-delivered hops must be idempotent on the replica")
  }
}
