package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SnapshotDiff]]: insert/delete/update classification with null-safe
  * compares, unchanged rows omitted, and the apply-the-delta round trip. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val before = Seq[(Long, String, java.lang.Double)](
    (1L, "a", 10.0),   // unchanged
    (2L, "b", 20.0),   // value update
    (3L, "c", null),   // null -> value update
    (4L, "d", 40.0),   // value -> null update
    (5L, "e", 50.0)    // deleted
  ).toDF("k", "s", "v")

  private val after = Seq[(Long, String, java.lang.Double)](
    (1L, "a", 10.0),
    (2L, "b", 21.0),
    (3L, "c", 30.0),
    (4L, "d", null),
    (6L, "f", 60.0)    // inserted
  ).toDF("k", "s", "v")

  test("classification: insert/delete/update with null-safe compares; unchanged omitted") {
    val d = SnapshotDiff.diff(before, after, Seq("k"))
      .orderBy("k").collect()
    assert(d.map(r => (r.getLong(1), r.getString(0))).toSeq ==
      Seq((2L, "update"), (3L, "update"), (4L, "update"),
        (5L, "delete"), (6L, "insert")))
    val byK = d.map(r => r.getLong(1) -> r).toMap
    assert(byK(3L).isNullAt(4) && byK(3L).getDouble(5) == 30.0) // b_v null, a_v 30
    assert(byK(4L).getDouble(4) == 40.0 && byK(4L).isNullAt(5))
    assert(byK(5L).getString(2) == "e" && byK(5L).isNullAt(3))  // b_s, a_s
    assert(byK(6L).isNullAt(2) && byK(6L).getString(3) == "f")
  }

  test("applying the delta to `before` reconstructs `after` (the CDC claim)") {
    val d = SnapshotDiff.diff(before, after, Seq("k"))
    val upserts = d.where(col("op") =!= "delete")
      .select(col("k"), col("a_s").as("s"), col("a_v").as("v"))
    val deletes = d.where(col("op") === "delete").select("k")
    val rebuilt = before.join(d.select("k"), Seq("k"), "left_anti")
      .unionByName(upserts)
      .join(deletes, Seq("k"), "left_anti")
    val want = after.collect().map(_.toSeq).toSet
    assert(rebuilt.collect().map(_.toSeq).toSet == want)
  }

  test("identical snapshots diff to zero rows; guards reject misuse") {
    assert(SnapshotDiff.diff(before, before, Seq("k")).count() == 0)
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(before, after, Nil)
    }
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(before, after.drop("v"), Seq("k"))
    }
  }

  test("diff + mergeInto(deletes) converges a persisted table to the new snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-diff-merge")
      .toString + "/t"
    val day = when(col("k") <= 3, "d0").otherwise("d1")
    val b = before.withColumn("day", day)
    val a = after.withColumn("day", when(col("k") <= 3, "d0").otherwise("d1"))
    b.write.partitionBy("day").parquet(dir)

    val d = SnapshotDiff.diff(b, a, Seq("k"))
    Upsert.mergeInto(dir,
      d.where(col("op") =!= "delete")
        .select(col("k"), col("a_s").as("s"), col("a_v").as("v"),
          col("a_day").as("day")),
      Seq("k"), "day",
      deletes = Some(d.where(col("op") === "delete")
        .select(col("k"), col("b_day").as("day"))))
    val got = spark.read.parquet(dir).select("k", "s", "v")
      .collect().map(_.toSeq).toSet
    assert(got == a.select("k", "s", "v").collect().map(_.toSeq).toSet,
      "persisted table must equal the target snapshot")
  }

  test("plan: one keyed join, no cartesian; composite keys work") {
    val b2 = before.withColumn("k2", col("k") % 2)
    val a2 = after.withColumn("k2", col("k") % 2)
    val d = SnapshotDiff.diff(b2, a2, Seq("k", "k2"))
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad plan:\n$plan")
    assert(d.where(col("op") === "insert").count() == 1)
    assert(d.columns.take(3).toSeq == Seq("op", "k", "k2"))
  }
}
