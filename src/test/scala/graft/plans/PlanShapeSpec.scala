package graft.plans

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.{SparkEntry, SparkSpec}
import graft.plans.PlanShape.Counts

/** Plan-shape regression CI for the whole gate.
  *
  * Every `SparkEntry.queries` entry is BUILT (not executed) against
  * sf0.001 and its pre-AQE operator counts ([[PlanShape.of]]) are checked
  * against the checked-in snapshot `dev/plan_shapes.json` as CEILINGS —
  * equal-or-fewer shuffles/sorts/windows/shuffle-joins/nested-loops stays
  * green (plans legitimately shrink when operators improve; broadcasts
  * may move either way below their ceiling), while a broadcast flipping
  * to a shuffle join, a new Exchange, or a join degenerating to
  * nested-loop goes red with the offending counts named.
  *
  * Regenerate after an INTENTIONAL plan change:
  * {{{ GRAFT_PLAN_SNAPSHOT=1 sbt "testOnly graft.plans.PlanShapeSpec" }}}
  * and commit the diff — the review surface is exactly "which query grew
  * which operator".
  */
class PlanShapeSpec extends SparkSpec {

  private val snapshotPath = new java.io.File("dev/plan_shapes.json")
  private val fields =
    Seq("shuffles", "broadcasts", "sorts", "windows", "shuffleJoins", "nestedLoops")

  private def toMap(c: Counts): Seq[(String, Int)] =
    fields.zip(Seq(c.shuffles, c.broadcasts, c.sorts, c.windows,
      c.shuffleJoins, c.nestedLoops))

  test("every gate query's plan shape is at or under the committed snapshot") {
    val shapes: Seq[(String, Counts)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> PlanShape.of(fn(spark, sf001))
      }

    if (sys.env.get("GRAFT_PLAN_SNAPSHOT").contains("1")) {
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      shapes.foreach { case (name, c) =>
        val o = root.putObject(name)
        toMap(c).foreach { case (k, v) => o.put(k, v) }
      }
      val out = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
      java.nio.file.Files.writeString(snapshotPath.toPath, out + "\n")
      info(s"snapshot written: ${shapes.size} queries -> $snapshotPath")
    } else {
      assert(snapshotPath.isFile,
        s"missing $snapshotPath - generate with GRAFT_PLAN_SNAPSHOT=1")
      val root = new ObjectMapper().readTree(snapshotPath).asInstanceOf[ObjectNode]
      val snapNames = root.fieldNames.asScala.toSet
      val liveNames = shapes.map(_._1).toSet

      val missing = liveNames -- snapNames
      assert(missing.isEmpty,
        s"queries not in plan snapshot (regenerate with GRAFT_PLAN_SNAPSHOT=1): " +
          missing.toSeq.sorted.mkString(", "))
      val stale = snapNames -- liveNames
      assert(stale.isEmpty,
        s"snapshot has queries no longer in the gate (regenerate): " +
          stale.toSeq.sorted.mkString(", "))

      val violations = shapes.flatMap { case (name, c) =>
        val s = root.get(name)
        val ceiling = Counts(s.get("shuffles").asInt, s.get("broadcasts").asInt,
          s.get("sorts").asInt, s.get("windows").asInt,
          s.get("shuffleJoins").asInt, s.get("nestedLoops").asInt)
        c.overages(ceiling).map(o => s"$name -> $o")
      }
      assert(violations.isEmpty,
        "plan-shape regressions:\n  " + violations.mkString("\n  "))
    }
  }

  test("the detector actually detects: forcing broadcasts off trips the ceiling") {
    assume(snapshotPath.isFile)
    val s = new ObjectMapper().readTree(snapshotPath).get("tpch_q5")
    val ceiling = Counts(s.get("shuffles").asInt, s.get("broadcasts").asInt,
      s.get("sorts").asInt, s.get("windows").asInt,
      s.get("shuffleJoins").asInt, s.get("nestedLoops").asInt)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val degraded = PlanShape.of(SparkEntry.queries("tpch_q5")(spark, sf001))
      assert(!degraded.fitsWithin(ceiling),
        s"q5 with broadcasts disabled should exceed the snapshot: $degraded")
    } finally spark.conf.set(key, prev)
  }
}
