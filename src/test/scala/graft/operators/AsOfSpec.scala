package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generic as-of join: reference-checked against a plain-Scala merge_asof,
  * deterministic tie-break, tolerance semantics, and the one-exchange plan
  * claim.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin == plain-Scala merge_asof on random series") {
    for (_ <- 1 to 10) {
      val left = (1 to 60).map(i =>
        (i.toLong, (i % 5).toLong, ts(rnd.nextInt(1000).toLong)))
      val right = (1 to 40).map(i =>
        ((i % 5).toLong, ts(rnd.nextInt(1000).toLong), i * 1.5))
      val expected = left.map { case (id, k, t) =>
        val candidates = right.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(r => (r._2.getTime, r._3))))
      }.toMap
      val got = AsOf.asofJoin(
          left.toDF("id", "k", "t"), right.toDF("rk", "rt", "price"),
          "k", "rk", "t", "rt", valueCols = Seq("price"))
        .select("id", "asof_rt", "asof_price")
        .as[(Long, Option[Timestamp], Option[Double])].collect()
      got.foreach { case (id, mt, mv) =>
        val exp = expected(id)
        assert(mt == exp.map(_._2), s"id $id ts")
        assert(mv == exp.map(_._3), s"id $id value")
      }
    }
  }

  test("ties: right rows at the same (key, ts) carry the lexicographic max payload") {
    val left = Seq((1L, 10L, ts(100))).toDF("id", "k", "t")
    val right = Seq((10L, ts(100), 5.0), (10L, ts(100), 9.0), (10L, ts(100), 7.0))
      .toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("asof_v").as[Double].head()
    assert(got == 9.0) // max by (rt, v), not insertion order
  }

  test("equal timestamps match (<= semantics); later rows do not") {
    val left = Seq((1L, 1L, ts(50)), (2L, 1L, ts(49))).toDF("id", "k", "t")
    val right = Seq((1L, ts(50), 1.0)).toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0)) // same-instant purchase visible
    assert(got(2L).isEmpty)       // earlier event sees nothing
  }

  test("tolerance nulls out stale matches but keeps the row") {
    val left = Seq((1L, 1L, ts(1000)), (2L, 1L, ts(4000))).toDF("id", "k", "t")
    val right = Seq((1L, ts(900), 2.0)).toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"),
        tolerance = Some(expr("INTERVAL 10 MINUTE")))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got.size == 2, "tolerance must not drop left rows")
    assert(got(1L).contains(2.0)) // 100 s back, inside 10 min
    assert(got(2L).isEmpty)       // 3100 s back, stale
  }

  test("null keys never match (join semantics), null right timestamps dropped") {
    val left = Seq((1L, Option.empty[Long], ts(100)), (2L, Some(1L), ts(100)))
      .toDF("id", "k", "t")
    val right = Seq((Option.empty[Long], Option(ts(50)), 9.0),
        (Some(1L), Option(ts(50)), 3.0),
        (Some(1L), Option.empty[Timestamp], 4.0))
      .toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty, "null-keyed left row must not enrich off null-keyed right")
    assert(got(2L).contains(3.0), "null-ts right row must not be carried")
  }

  test("collision and type-mismatch guards fail fast") {
    val left = Seq((1L, 1L, ts(1), 0.0)).toDF("id", "k", "t", "asof_rt")
    val right = Seq((1L, ts(1), 1.0)).toDF("rk", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
    }
    val badKey = Seq(("1", ts(1), 1.0)).toDF("rk", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left.drop("asof_rt"), badKey, "k", "rk", "t", "rt", Seq("v"))
    }
  }

  test("asofJoinSplit == asofJoin on random series (hot key forced to split)") {
    for (seed <- 1 to 5) {
      val r2 = new scala.util.Random(seed)
      // key 0 is hot (most rows); maxKeyRows=20 forces several subs
      val left = (1 to 120).map(i =>
        (i.toLong, if (i % 3 == 0) (i % 4).toLong else 0L, ts(r2.nextInt(1000).toLong)))
      val right = (1 to 80).map(i =>
        (if (i % 4 == 0) (i % 3).toLong else 0L, ts(r2.nextInt(1000).toLong), i * 1.5))
      val ldf = left.toDF("id", "k", "t")
      val rdf = right.toDF("rk", "rt", "price")
      val base = AsOf.asofJoin(ldf, rdf, "k", "rk", "t", "rt", Seq("price"))
        .select("id", "asof_rt", "asof_price")
        .as[(Long, Option[Timestamp], Option[Double])].collect().sortBy(_._1)
      val split = AsOf.asofJoinSplit(ldf, rdf, "k", "rk", "t", "rt", Seq("price"),
          maxKeyRows = 20)
        .select("id", "asof_rt", "asof_price")
        .as[(Long, Option[Timestamp], Option[Double])].collect().sortBy(_._1)
      assert(split.toSeq == base.toSeq, s"seed $seed: split path diverged")
    }
  }

  test("asofJoinSplit: carry crosses right-row-free subs; tolerance rides along") {
    // one hot key; the only right row sits at t=0, then a long left-only
    // stretch spread over the timeline — every sub after the first has NO
    // right rows and must inherit the boundary carry
    val left = (1 to 100).map(i => (i.toLong, 7L, ts(i * 10L))).toDF("id", "k", "t")
    val right = Seq((7L, ts(0), 42.0)).toDF("rk", "rt", "v")
    val got = AsOf.asofJoinSplit(left, right, "k", "rk", "t", "rt", Seq("v"),
        maxKeyRows = 10)
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got.size == 100)
    assert(got.values.forall(_.contains(42.0)),
      "entering carry failed to cross an empty sub")
    // tolerance still nulls stale matches on the split path
    val tol = AsOf.asofJoinSplit(left, right, "k", "rk", "t", "rt", Seq("v"),
        tolerance = Some(expr("INTERVAL 500 SECOND")), maxKeyRows = 10)
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(tol(40L).contains(42.0) && tol(60L).isEmpty)
  }

  test("asofJoinSplit plan: the carry window partitions by (key, sub)") {
    val left = spark.range(1000).select(col("id"), lit(1L).as("k"),
      timestamp_micros(col("id") * 1000000L).as("t"))
    val right = spark.range(300).select(lit(1L).as("rk"),
      timestamp_micros(col("id") * 3000000L).as("rt"), (col("id") * 1.0).as("v"))
    val out = AsOf.asofJoinSplit(left, right, "k", "rk", "t", "rt", Seq("v"),
      maxKeyRows = 100)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    val mainWin = plan.split("\n")
      .filter(l => l.contains("Window ") && l.contains("_m_local"))
    assert(mainWin.nonEmpty &&
      mainWin.forall(l => l.contains("windowspecdefinition(_k#") && l.contains("_sub#")),
      s"carry window is not sub-split:\n${plan.take(4000)}")
  }

  test("plan: ONE hash-exchange of the unioned relation, no join operator at all") {
    val left = spark.range(1000).select(col("id"), (col("id") % 10).as("k"),
      timestamp_micros(col("id") * 1000000L).as("t"))
    val right = spark.range(300).select((col("id") % 10).as("rk"),
      timestamp_micros(col("id") * 3000000L).as("rt"), (col("id") * 1.0).as("v"))
    val out = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin should not JOIN:\n$plan")
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected 1 exchange, saw $nExchanges:\n$plan")
    val winLines = plan.split("\n").filter(_.contains("Window "))
    assert(winLines.nonEmpty && winLines.forall(_.contains("windowspecdefinition(_k#")),
      "window lost its key partitioning")
  }
}
