package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{IndexedScan, StatsIndex}

/** Schema evolution on the versioned merge ([[Upsert.mergeIntoVersioned]]
  * + the generation schema sidecar): an update batch may ADD columns
  * (old files are never rewritten — the evolved schema is recorded with
  * the generation and index-served reads fill nulls in pre-evolution
  * files) and may OMIT non-key columns (a delta feed rarely republishes
  * every column); type changes are refused loudly. Time travel keeps
  * each generation's own schema; the change feed aligns across the
  * evolution boundary. */
class SchemaEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def byId(df: DataFrame) = df
    .select(col("order_id").cast("long"), col("day").cast("string"),
      col("amount").cast("double"),
      (if (df.columns.contains("note")) col("note") else lit(null))
        .cast("string").as("note"))
    .as[(Long, String, Option[Double], Option[String])].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("added column: old files read as null under the evolved schema; time travel keeps old schemas") {
    val root = Files.createTempDirectory("graft-evo").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val g1 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 10.0), (2L, "d1", 20.0), (3L, "d2", 30.0))
        .toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)

    // gen2 ADDS `note`, touches only partition d1
    val g2 = Upsert.mergeIntoVersioned(path,
      Seq((2L, "d1", 99.0, "vip")).toDF("order_id", "day", "amount", "note"),
      Seq("order_id"), "day", idx)

    val now = IndexedScan.readIndexedVersioned(spark, path, idx)
    assert(now.columns.toSet == Set("order_id", "day", "amount", "note"),
      s"evolved read schema: ${now.columns.mkString(",")}")
    val m = byId(now)
    assert(m(2L) == (("d1", Some(99.0), Some("vip"))))
    // row 1 shares the rewritten d1 partition (merged under the evolved
    // schema); row 3's FILE predates the evolution and was never
    // rewritten — its note must materialize as null through the scan
    assert(m(1L) == (("d1", Some(10.0), None)))
    assert(m(3L) == (("d2", Some(30.0), None)))

    // time travel: generation 1 still reads with its OWN schema
    val old = ChangeFeed.asOf(spark, path, idx, g1)
    assert(old.columns.toSet == Set("order_id", "day", "amount"))
    assert(old.count() == 3)

    // the recorded sidecars match what each generation serves
    assert(StatsIndex.generationSchema(spark, idx, g1).get
      .fieldNames.toSet == Set("order_id", "amount"))
    assert(StatsIndex.generationSchema(spark, idx, g2).get
      .fieldNames.toSet == Set("order_id", "amount", "note"))

    // change feed across the evolution boundary: landed note = update
    // payload; row 3's null-vs-null note is NOT a change
    val feed = ChangeFeed.between(spark, path, idx, g1, g2,
        Seq("order_id"), "day")
      .select(col("op"), col("order_id").cast("long"),
        col("b_note"), col("a_note"))
      .as[(String, Long, Option[String], Option[String])].collect().toSet
    assert(feed == Set(("update", 2L, None, Some("vip"))))

    // gen3 OMITS a non-key column (`amount`): surviving rows keep their
    // merged values only where republished — the omitted column lands
    // null for the new row, and the recorded schema is unchanged
    val g3 = Upsert.mergeIntoVersioned(path,
      Seq((4L, "d2", "new")).toDF("order_id", "day", "note"),
      Seq("order_id"), "day", idx)
    val after = byId(IndexedScan.readIndexedVersioned(spark, path, idx))
    assert(after(4L) == (("d2", None, Some("new"))), "omitted column lands null")
    assert(StatsIndex.generationSchema(spark, idx, g3).get
      .fieldNames.toSet == Set("order_id", "amount", "note"))
    assert(after(3L) == (("d2", Some(30.0), None)), "old co-partition row survives")

    // type evolution is refused loudly
    val e = intercept[IllegalArgumentException] {
      Upsert.mergeIntoVersioned(path,
        Seq((9L, "d1", "oops")).toDF("order_id", "day", "amount"),
        Seq("order_id"), "day", idx)
    }
    assert(e.getMessage.contains("type"))

    // vacuuming generations reaps the schema sidecars with them
    StatsIndex.vacuumGenerations(spark, idx, keep = 1)
    assert(StatsIndex.generationSchema(spark, idx, g1).isEmpty)
    assert(StatsIndex.generationSchema(spark, idx, g3).nonEmpty)
  }
}
