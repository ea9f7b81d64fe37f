package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in window-top-k → heap-aggregate rewrite: fires only under the
  * flag and only on the provably-equivalent shapes; results identical to
  * the unrewritten plan; non-matching idioms untouched.
  */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val Flag = "spark.graft.rewrite.topk"

  private def withFlag[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.getOption(Flag)
    spark.conf.set(Flag, on.toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(Flag, v)
      case None => spark.conf.unset(Flag)
    }
  }

  private def topkDf = {
    val df = Seq(
      ("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 5.0), ("g", 4L, 1.0),
      ("h", 5L, 7.0), ("h", 6L, 9.0)).toDF("grp", "id", "score")
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= 2)
  }

  test("flag off: plan untouched (window stays)") {
    withFlag(on = false) {
      val plan = topkDf.queryExecution.optimizedPlan.toString
      assert(plan.contains("Window"), s"expected an unrewritten window:\n$plan")
      assert(!plan.contains("graft_topk"), s"rewrite fired with flag off:\n$plan")
    }
  }

  test("flag on: plan rewritten to the heap aggregate, results identical") {
    val expected = withFlag(on = false) {
      topkDf.select("grp", "id", "score", "rank")
        .as[(String, Long, Double, Int)].collect().toSet
    }
    withFlag(on = true) {
      val df = topkDf
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_topk"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
      val got = df.select("grp", "id", "score", "rank")
        .as[(String, Long, Double, Int)].collect().toSet
      assert(got == expected, "rewritten results diverged")
      // ties: 10.0/10.0 resolves by id on both paths
      assert(got.contains(("g", 1L, 10.0, 1)) && got.contains(("g", 2L, 10.0, 2)))
    }
  }

  test("downstream references survive: aggregate over the rewritten output") {
    withFlag(on = true) {
      val agg = topkDf.groupBy("grp").agg(sum("score").as("s"))
        .orderBy("grp").as[(String, Double)].collect().toSeq
      assert(agg == Seq(("g", 20.0), ("h", 16.0)))
    }
  }

  test("ascending non-nullable integral tie-break inverts via bitwise-not, incl. extremes") {
    withFlag(on = true) {
      val df = Seq(("g", Long.MinValue, 5.0), ("g", Long.MaxValue, 5.0),
          ("g", 0L, 5.0)).toDF("grp", "id", "score")
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
      val out = df.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 2)
      assert(out.queryExecution.optimizedPlan.toString.contains("graft_topk"))
      val got = out.select("id", "rank").as[(Long, Int)].collect().toSet
      // asc ids at a tied score: MinValue first — negation would corrupt
      // this exact case, bitwise-not must not
      assert(got == Set((Long.MinValue, 1), (0L, 2)))
    }
  }

  test("non-matching shapes stay untouched under the flag") {
    withFlag(on = true) {
      val df = Seq(("g", 1L, 10.0), ("g", 2L, 5.0)).toDF("grp", "id", "score")
      // ascending DOUBLE sort key: not invertible (NaN) → no rewrite
      val w1 = Window.partitionBy("grp").orderBy(col("score"))
      val p1 = df.withColumn("rank", row_number().over(w1)).where(col("rank") <= 1)
        .queryExecution.optimizedPlan.toString
      assert(p1.contains("Window") && !p1.contains("graft_topk"), p1)
      // rank() instead of row_number(): different tie semantics → no rewrite
      val w2 = Window.partitionBy("grp").orderBy(col("score").desc)
      val p2 = df.withColumn("rank", rank().over(w2)).where(col("rank") <= 1)
        .queryExecution.optimizedPlan.toString
      assert(p2.contains("Window") && !p2.contains("graft_topk"), p2)
      // non-literal k → no rewrite
      val p3 = df.withColumn("rank", row_number().over(w2))
        .where(col("rank") <= col("id"))
        .queryExecution.optimizedPlan.toString
      assert(p3.contains("Window") && !p3.contains("graft_topk"), p3)
    }
  }

  test("non-orderable passenger column (map) blocks the rewrite instead of crashing") {
    withFlag(on = true) {
      val df = Seq(("g", 1L, 10.0), ("g", 2L, 5.0)).toDF("grp", "id", "score")
        .withColumn("m", map(lit("k"), col("id")))
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
      val out = df.withColumn("rank", row_number().over(w)).where(col("rank") <= 1)
      val plan = out.queryExecution.optimizedPlan.toString
      assert(plan.contains("Window") && !plan.contains("graft_topk"),
        s"rewrite must skip map-typed payloads:\n$plan")
      assert(out.count() == 1) // and the query still runs
    }
  }

  test("k above maxK keeps the window's spillable sort") {
    withFlag(on = true) {
      val df = Seq(("g", 1L, 10.0), ("g", 2L, 5.0)).toDF("grp", "id", "score")
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
      val out = df.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 100000000)
      val plan = out.queryExecution.optimizedPlan.toString
      assert(plan.contains("Window") && !plan.contains("graft_topk"),
        s"huge k must not become an in-memory heap:\n$plan")
    }
  }

  test("rank < k and reversed literal comparisons rewrite with the right bound") {
    withFlag(on = true) {
      val df = Seq(("g", 1L, 9.0), ("g", 2L, 8.0), ("g", 3L, 7.0))
        .toDF("grp", "id", "score")
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
      val lt = df.withColumn("rank", row_number().over(w)).where(col("rank") < 3)
      assert(lt.queryExecution.optimizedPlan.toString.contains("graft_topk"))
      assert(lt.count() == 2)
      val rev = df.withColumn("rank", row_number().over(w)).where(lit(2) >= col("rank"))
      assert(rev.queryExecution.optimizedPlan.toString.contains("graft_topk"))
      assert(rev.count() == 2)
    }
  }
}
