package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[HeavyHitters]]: the Misra–Gries screen must never lose a true heavy
  * hitter (one-sided), the verify pass must report EXACT counts, and the
  * whole thing must equal the plain groupBy reference. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, c: String,
                        support: Double): Set[(String, Long)] = {
    val n = df.count()
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .where(col("cnt").cast("double") >= support * n)
      .as[(String, Long)].collect().toSet
  }

  test("boundary-frequency key diluted across partitions is still found, count exact") {
    // 'hot' occurs EXACTLY support×n times, spread evenly over 8
    // partitions — the worst case for a per-partition screen; pigeonhole
    // + the MG bound must still surface it
    val n = 10000
    val support = 0.01
    val rows = (0 until n).map { i =>
      if (i % 100 == 0) "hot" else s"noise_${i % 3000}"
    }
    val df = rows.toDF("k").repartition(8)
    val got = HeavyHitters.frequent(df, "k", support)
      .as[(String, Long)].collect().toSet
    assert(got.contains(("hot", 100L)), s"boundary heavy hitter lost: $got")
    assert(got == reference(df, "k", support))
  }

  test("property: frequent == groupBy reference on skewed random data") {
    val rng = new scala.util.Random(7L)
    // zipf-ish: key j with weight ~ 1/j over 500 keys, 20k rows
    val keys = (0 until 20000).map { _ =>
      val u = rng.nextDouble()
      s"k${math.min(499, math.floor(math.exp(u * math.log(500))).toInt)}"
    }
    for (support <- Seq(0.002, 0.01, 0.05)) {
      val df = keys.toDF("k").repartition(16)
      val got = HeavyHitters.frequent(df, "k", support)
        .as[(String, Long)].collect().toSet
      assert(got == reference(df, "k", support),
        s"support=$support diverged from reference")
      assert(got.nonEmpty, s"support=$support found nothing (fixture too flat)")
    }
  }

  test("null keys are never reported but still count toward n; empty input yields empty") {
    val df = (Seq.fill(50)(Option("a")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("k")
    // n = 100 (nulls included): 'a' at 50/100 clears support 0.4
    val got = HeavyHitters.frequent(df, "k", 0.4)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 50L)))
    val empty = HeavyHitters.frequent(
      Seq.empty[String].toDF("k"), "k", 0.1)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k", "cnt"))
  }
}
