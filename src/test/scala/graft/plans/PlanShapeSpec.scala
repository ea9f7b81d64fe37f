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
    // per-query failure isolation: one unbuildable query must surface as a
    // NAMED failure list while the other ~113 still get their ceiling check
    // (r11: a testdata schema drift broke 9 builds and this spec previously
    // aborted wholesale on the first, yielding zero plan coverage)
    val built: Seq[(String, Either[Throwable, Counts])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> scala.util.Try(PlanShape.of(fn(spark, sf001))).toEither
      }
    val unbuildable = built.collect { case (name, Left(e)) =>
      s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ").take(200)}"
    }
    val shapes: Seq[(String, Counts)] = built.collect { case (name, Right(c)) => name -> c }

    if (sys.env.get("GRAFT_PLAN_SNAPSHOT").contains("1")) {
      assert(unbuildable.isEmpty,
        "refusing to write a PARTIAL snapshot; unbuildable queries:\n  " +
          unbuildable.mkString("\n  "))
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
      val liveNames = built.map(_._1).toSet

      // collect ALL problem classes, then assert once — so a build failure
      // cannot mask ceiling regressions elsewhere (or vice versa)
      val problems = Seq.newBuilder[String]
      unbuildable.foreach(u => problems += s"unbuildable: $u")
      (liveNames -- snapNames).toSeq.sorted.foreach(n =>
        problems += s"not in plan snapshot (regenerate with GRAFT_PLAN_SNAPSHOT=1): $n")
      (snapNames -- liveNames).toSeq.sorted.foreach(n =>
        problems += s"snapshot has query no longer in the gate (regenerate): $n")
      shapes.filter { case (name, _) => snapNames(name) }.foreach { case (name, c) =>
        val s = root.get(name)
        val ceiling = Counts(s.get("shuffles").asInt, s.get("broadcasts").asInt,
          s.get("sorts").asInt, s.get("windows").asInt,
          s.get("shuffleJoins").asInt, s.get("nestedLoops").asInt)
        c.overages(ceiling).foreach(o => problems += s"plan-shape regression: $name -> $o")
      }
      val all = problems.result()
      info(s"ceiling-checked ${shapes.count { case (n, _) => snapNames(n) }} of ${built.size} queries")
      assert(all.isEmpty, "plan-shape problems:\n  " + all.mkString("\n  "))
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
