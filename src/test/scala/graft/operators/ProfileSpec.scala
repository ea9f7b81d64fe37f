package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Profile]]: exact values on a hand-computable frame, the approx
  * distinct swap, loud failures, and the one-scan contract. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numeric profile matches hand-computed values incl. nulls") {
    val df = Seq((Option(1.0), 1L), (None, 2L), (Option(3.0), 2L),
      (Option(1.0), 5L)).toDF("v", "k")
    val rows = Profile.numeric(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toList
    assert(rows == List(
      ("k", 4L, 0L, 3L, 1.0, 5.0, 10.0),
      ("v", 4L, 1L, 2L, 1.0, 3.0, 5.0)))
  }

  test("approx mode: distinct within 3·RSE, every other metric identical") {
    val df = spark.range(60000).select((col("id") % 40000).as("x"))
    val exact = Profile.numeric(df, Seq("x")).head()
    val approx = Profile.numeric(df, Seq("x"), exact = false).head()
    assert(math.abs(approx.getLong(3) - 40000.0) / 40000.0 <= 0.06,
      s"approx distinct ${approx.getLong(3)}")
    // all but n_distinct identical
    assert(Seq(0, 1, 2, 4, 5, 6).forall(i => exact.get(i) == approx.get(i)))
  }

  test("unknown columns fail loudly, naming them") {
    val e = intercept[IllegalArgumentException] {
      Profile.numeric(Seq(1).toDF("a"), Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("string profile: nulls, empties, lengths, distinct — hand-computed") {
    val df = Seq(Option("ab"), Option(""), None, Option("abcd"), Option("ab"))
      .toDF("s")
    val row = Profile.strings(df, Seq("s"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(row == (("s", 5L, 1L, 1L, 3L, 0L, 4L, 8L)))
  }

  test("histogram: edges, out-of-range bins, right-closed last bin, nulls") {
    val df = Seq[Option[Double]](Some(0.0), Some(2.5), Some(5.0), Some(10.0),
      Some(-3.0), Some(12.0), None, Some(9.999)).toDF("v")
    // lo=0, hi=10, 4 bins of width 2.5
    val rows = Profile.histogram(df, "v", 0.0, 10.0, 4)
      .as[(Int, Double, Double, Long)].collect().toList
    assert(rows == List(
      (-1, -2.5, 0.0, 1L),   // -3.0 below range, counted not dropped
      (0, 0.0, 2.5, 1L),     // 0.0
      (1, 2.5, 5.0, 1L),     // 2.5 (left-closed)
      (2, 5.0, 7.5, 1L),     // 5.0
      (3, 7.5, 10.0, 2L),    // 9.999 and 10.0 (right-closed last bin)
      (4, 10.0, 12.5, 1L)))  // 12.0 above range
    assert(rows.map(_._4).sum == 7) // everything but the null
  }

  test("one scan regardless of profiled column count") {
    val li = Tables.load(spark, sf001, "lineitem")
    val p = Profile.numeric(li,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    p.collect()
    // AQE hides the final plan behind AdaptiveSparkPlanExec and its
    // QueryStageExec nodes — walk through both
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Int = pl.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _: FileSourceScanExec => 1
    }.sum
    val n = scans(p.queryExecution.executedPlan)
    assert(n == 1, s"expected one scan, got $n")
  }
}
