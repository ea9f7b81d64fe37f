package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("Dag: topological order, retry, skip downstream of failure") {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    var attempts = 0
    val tasks = Seq(
      Dag.Task("a")(() => log += "a"),
      Dag.Task("b", deps = Seq("a"), retries = 2)(() => {
        attempts += 1
        if (attempts < 3) throw new RuntimeException("flaky")
        log += "b"
      }),
      Dag.Task("c", deps = Seq("b"))(() => log += "c"),
      Dag.Task("d", deps = Seq("a"))(() => throw new RuntimeException("boom")),
      Dag.Task("e", deps = Seq("d"))(() => log += "e"))
    val report = Dag.run(tasks)
    assert(log.toSeq == Seq("a", "b", "c")) // flaky b retried to success; e skipped
    assert(report.statuses("b") == Dag.Success && attempts == 3)
    assert(report.statuses("d").isInstanceOf[Dag.Failed])
    assert(report.statuses("e") == Dag.Skipped)
    assert(!report.succeeded)
  }

  test("Dag: cycle detection") {
    val tasks = Seq(
      Dag.Task("x", deps = Seq("y"))(() => ()),
      Dag.Task("y", deps = Seq("x"))(() => ()))
    intercept[IllegalStateException](Dag.run(tasks))
  }

  test("Dag.backfill runs per logical date in order") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val reports = Dag.backfill(Seq("2024-01-01", "2024-01-02")) { ds =>
      Seq(Dag.Task(s"load")(() => seen += ds))
    }
    assert(seen.toSeq == Seq("2024-01-01", "2024-01-02"))
    assert(reports.values.forall(_.succeeded))
  }

  test("StarPipeline end-to-end at sf0.001, idempotent re-run") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val r1 = StarPipeline.run(spark, sf001, wh)
    assert(r1.succeeded, s"pipeline failed: ${r1.statuses}")
    val ss1 = spark.read.parquet(s"$wh/datamart/sales_summary")
    val n1 = ss1.count()
    assert(n1 > 0)
    assert(spark.read.parquet(s"$wh/core/fact_orders").count() == 6000)
    // re-run → identical layer (idempotency)
    val r2 = StarPipeline.run(spark, sf001, wh)
    assert(r2.succeeded)
    assert(spark.read.parquet(s"$wh/datamart/sales_summary").count() == n1)
  }
}
