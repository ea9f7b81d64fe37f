package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("fromHistory: change detection, intervals, versions") {
    val history = Seq(
      (1L, "2024-01-01 00:00:00", "A", 1L),
      (1L, "2024-01-02 00:00:00", "A", 2L), // no change → dropped
      (1L, "2024-01-03 00:00:00", "B", 3L), // change → new version
      (1L, "2024-01-04 00:00:00", "A", 4L), // change back → third version
      (2L, "2024-01-01 00:00:00", "X", 5L)
    ).toDF("user_id", "ts_s", "state", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

    val dim = Scd2.fromHistory(history, "user_id", "ts", "state", Seq("event_id"))
      .orderBy("user_id", "version")
    val rows = dim.select("user_id", "state", "version", "is_current").collect()

    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3))).toSeq ==
      Seq((1L, "A", 1, false), (1L, "B", 2, false), (1L, "A", 3, true), (2L, "X", 1, true)))

    // interval chaining: expiration of v1 == effective of v2
    val u1 = dim.where($"user_id" === 1).orderBy("version")
      .select("effective_ts", "expiration_ts").collect()
    assert(u1(0).getTimestamp(1) == u1(1).getTimestamp(0))
    assert(u1(2).isNullAt(1))
  }

  test("snapshotAt: the dimension as of an instant is the historical truth") {
    val history = Seq(
      (1L, "2024-01-01 00:00:00", "A", 1L),
      (1L, "2024-01-05 00:00:00", "B", 2L),
      (2L, "2024-01-03 00:00:00", "X", 3L)
    ).toDF("user_id", "ts_s", "state", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val dim = Scd2.fromHistory(history, "user_id", "ts", "state", Seq("event_id"))
    def at(ts: String): Set[(Long, String)] =
      Scd2.snapshotAt(dim, lit(ts).cast("timestamp"))
        .select("user_id", "state").as[(Long, String)].collect().toSet
    // before user 2 exists: only user 1's first version
    assert(at("2024-01-02 00:00:00") == Set((1L, "A")))
    // mid-history: both alive, user 1 still on A
    assert(at("2024-01-04 00:00:00") == Set((1L, "A"), (2L, "X")))
    // ON the version boundary: the new version is effective (eff <= ts)
    assert(at("2024-01-05 00:00:00") == Set((1L, "B"), (2L, "X")))
    // after everything: equals the current rows
    assert(at("2024-02-01 00:00:00") ==
      dim.where($"is_current").select("user_id", "state")
        .as[(Long, String)].collect().toSet)
    // before everything: empty, not an error
    assert(at("2023-12-31 00:00:00").isEmpty)
    // and the plan is a pure filter: no exchange, no window
    val plan = Scd2.snapshotAt(dim, lit("2024-01-04 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") ||
      dim.queryExecution.executedPlan.toString.contains("Exchange"),
      "snapshotAt added an exchange beyond the dim's own build")
  }

  test("mergeSnapshot: expire changed, insert new, keep unchanged") {
    val dim = Seq(
      (1L, "alice", "2024-01-01", null.asInstanceOf[String], true),
      (2L, "bob", "2024-01-01", null.asInstanceOf[String], true)
    ).toDF("customer_id", "name", "eff", "exp", "is_current")
      .select(col("customer_id"), col("name"),
        col("eff").cast("date").as("effective_date"),
        col("exp").cast("date").as("expiration_date"), col("is_current"))

    val snapshot = Seq((1L, "alice2"), (3L, "carol")).toDF("customer_id", "name")

    val merged = Scd2.mergeSnapshot(dim, snapshot, "customer_id", Seq("name"), "2024-02-01")

    // alice: expired old + new current version; bob untouched; carol new
    assert(merged.count() == 4)
    val alice = merged.where($"customer_id" === 1).orderBy("effective_date").collect()
    assert(alice.length == 2)
    assert(!alice(0).getAs[Boolean]("is_current") && alice(1).getAs[Boolean]("is_current"))
    assert(alice(1).getAs[String]("name") == "alice2")
    val bob = merged.where($"customer_id" === 2).collect()
    assert(bob.length == 1 && bob(0).getAs[Boolean]("is_current"))
    val carol = merged.where($"customer_id" === 3).collect()
    assert(carol.length == 1 && carol(0).getAs[String]("name") == "carol")
  }
}
