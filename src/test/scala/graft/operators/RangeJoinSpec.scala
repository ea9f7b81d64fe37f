package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binned range join: reference-checked against the nested-loop answer,
  * exactly-once pair semantics across bin boundaries, keyed variant, and
  * the equi-join plan claim.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(41)

  test("rangeJoin == nested-loop reference on random data, several binWidths") {
    for (bw <- Seq(0.5, 3.0, 10.0, 100.0)) {
      val points = (1 to 80).map(i => (i.toLong, rnd.nextDouble() * 50))
      val ivals = (1 to 30).map { i =>
        val lo = rnd.nextDouble() * 45
        (i.toLong, lo, lo + rnd.nextDouble() * 10)
      }
      val expected = (for {
        (pid, p) <- points; (iid, lo, hi) <- ivals if p >= lo && p < hi
      } yield (pid, iid)).sorted
      val got = RangeJoin.rangeJoin(
          points.toDF("pid", "p"), ivals.toDF("iid", "lo", "hi"),
          "p", "lo", "hi", binWidth = bw)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == expected, s"binWidth=$bw")
    }
  }

  test("pairs meet exactly once even when an interval spans many bins") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val ivals = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi") // 100 bins at bw=1
    val got = RangeJoin.rangeJoin(points, ivals, "p", "lo", "hi", binWidth = 1.0)
    assert(got.count() == 1, "bin explosion must not duplicate pairs")
  }

  test("half-open semantics: lo matches, hi does not") {
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "p")
    val ivals = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, ivals, "p", "lo", "hi", binWidth = 5.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("keyed variant joins only within the key") {
    val points = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "k", "p")
    val ivals = Seq((10L, "a", 0.0, 10.0)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, ivals, "p", "lo", "hi",
        binWidth = 10.0, keyCols = Seq("k"))
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("negative values bin correctly") {
    val points = Seq((1L, -7.5), (2L, 7.5)).toDF("pid", "p")
    val ivals = Seq((1L, -10.0, 0.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, ivals, "p", "lo", "hi", binWidth = 3.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("plan: equi-join on the bin, never BroadcastNestedLoop") {
    val points = spark.range(1000).select(col("id").as("pid"),
      (col("id") % 97 * 1.0).as("p"))
    val ivals = spark.range(50).select(col("id").as("iid"),
      (col("id") * 2.0).as("lo"), (col("id") * 2.0 + 5.0).as("hi"))
    val out = RangeJoin.rangeJoin(points, ivals, "p", "lo", "hi", binWidth = 5.0)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("guards: bad binWidth and colliding columns fail fast") {
    val p = Seq((1L, 1.0)).toDF("pid", "p")
    val i = Seq((1L, 0.0, 2.0)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(p, i, "p", "lo", "hi", binWidth = 0.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(p, i.withColumnRenamed("iid", "pid"),
        "p", "lo", "hi", binWidth = 1.0)
    }
  }
}
