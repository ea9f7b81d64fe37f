package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{ChangeFeed, Upsert}

/** One-call retention ([[StatsIndex.retire]]): generations past `keep`
  * go, and data files survive iff a RETAINED generation still names
  * them — every retained snapshot stays time-travel readable, which a
  * bare `vacuum(table, loadLatest)` would break. */
class RetireSpec extends SparkSpec {
  import spark.implicits._

  test("retire keeps every retained generation readable; the bare latest-only vacuum would not") {
    val root = Files.createTempDirectory("graft-retire").toString
    val (path, idx) = (s"$root/t", s"$root/t/_stats_v")
    val g1 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 10.0), (2L, "d2", 20.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    val g2 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 11.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)
    val g3 = Upsert.mergeIntoVersioned(path,
      Seq((1L, "d1", 12.0)).toDF("order_id", "day", "amount"),
      Seq("order_id"), "day", idx)

    // keep=2: g1's manifest goes; g2/g3 stay. g1's d1 file is named by
    // NO retained generation (g2 rewrote d1) → reaped; g1's d2 file is
    // still named by g2 AND g3 → must survive.
    val (gens, files) = StatsIndex.retire(spark, path, idx, keep = 2)
    assert(gens.exists(_.endsWith(s"_v=$g1")) && gens.size == 1)
    assert(files.nonEmpty, "g1's replaced d1 file should be reaped")
    assert(files.forall(_.contains("/day=d1/")),
      s"only d1 files are unreferenced; reaped: ${files.mkString(", ")}")

    // BOTH retained generations still answer — the retention invariant
    assert(ChangeFeed.asOf(spark, path, idx, g2)
      .select(col("order_id"), col("amount")).as[(Long, Double)]
      .collect().toSet == Set((1L, 11.0), (2L, 20.0)))
    assert(ChangeFeed.asOf(spark, path, idx, g3)
      .select(col("order_id"), col("amount")).as[(Long, Double)]
      .collect().toSet == Set((1L, 12.0), (2L, 20.0)))
    intercept[Exception] {
      ChangeFeed.asOf(spark, path, idx, g1).collect()
    }

    // idempotent
    val (gens2, files2) = StatsIndex.retire(spark, path, idx, keep = 2)
    assert(gens2.isEmpty && files2.isEmpty)
  }
}
