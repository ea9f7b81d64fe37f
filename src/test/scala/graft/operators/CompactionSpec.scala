package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // day=a: 8 small files (bad layout); day=b: 1 file (already good)
    (1 to 800).map(i => (i.toLong, "a")).toDF("id", "day")
      .repartition(8).write.partitionBy("day").mode("overwrite").parquet(dir)
    (1 to 100).map(i => (i.toLong, "b")).toDF("id", "day")
      .coalesce(1).write.partitionBy("day").mode("append").parquet(dir)
    dir
  }

  private def partFiles(dir: String, part: String) = {
    val p = new Path(s"$dir/$part")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).sortBy(_._1)
  }

  test("plan flags only over-target partitions; compact rewrites them, leaves the rest byte-identical; re-run no-op") {
    val dir = writeFixture()
    val before = spark.read.parquet(dir)
      .select("id", "day").as[(Long, String)].collect().sorted

    val plan = Compaction.plan(spark, dir, targetBytes = 1L << 20)
    val byPart = plan.map(p => p.partition -> p).toMap
    assert(byPart("day=a").nFiles == 8 && byPart("day=a").targetFiles == 1 &&
      byPart("day=a").compact)
    assert(byPart("day=b").nFiles == 1 && !byPart("day=b").compact)

    val untouchedBefore = partFiles(dir, "day=b")
    val report = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(report.partitionsCompacted == 1 && report.filesBefore == 8 &&
      report.filesAfter == 1, s"got $report")
    assert(partFiles(dir, "day=a").length == 1)
    // the good partition was never read, never written
    assert(partFiles(dir, "day=b").toSeq == untouchedBefore.toSeq)
    // data survives exactly
    val after = spark.read.parquet(dir)
      .select("id", "day").as[(Long, String)].collect().sorted
    assert(after.toSeq == before.toSeq)
    // idempotent: the plan is now empty
    assert(Compaction.compact(spark, dir, targetBytes = 1L << 20) ==
      Compaction.Report(0, 0, 0, 0L))
    // no staging residue
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(new Path(dir)).exists(_.getPath.getName.startsWith("_staging")))
  }

  test("byte-derived targets: halving targetBytes doubles the file budget") {
    val dir = writeFixture()
    val bytes = Compaction.plan(spark, dir, targetBytes = 1L << 20)
      .find(_.partition == "day=a").get.bytes
    // a target of bytes/2 (+1 for rounding) wants ceil(2-ish) files
    val p2 = Compaction.plan(spark, dir, targetBytes = bytes / 2 + 1)
      .find(_.partition == "day=a").get
    assert(p2.targetFiles == 2 && p2.compact, s"got $p2")
    val report = Compaction.compact(spark, dir, targetBytes = bytes / 2 + 1)
    assert(report.partitionsCompacted == 1)
    assert(partFiles(dir, "day=a").length == 2)
    // minFiles floor: 2 files >= target but < minFiles=4 -> churn guard
    assert(Compaction.plan(spark, dir, targetBytes = 1L << 20)
      .find(_.partition == "day=a").get.compact == false)
  }

  test("zorderBy: compacted partition gains multi-column data skipping") {
    import org.apache.spark.sql.functions.{col, rand}
    // one bad-layout partition of 8k rows over two independent dims
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-z").toString
    val seeded = new scala.util.Random(7)
    (1 to 8000).map { i =>
      (i.toLong, seeded.nextInt(1000).toLong, seeded.nextDouble() * 500, "a")
    }.toDF("id", "uid", "score", "day")
      .repartition(16).write.partitionBy("day").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
      .select("id").as[Long].collect().sorted.toSeq

    // compact 16 bad files into 8 z-ordered ones; the skipping assertion
    // below is absolute (fraction of ROWS materialized), so it measures
    // clustering, not merely fewer files
    val bytes = Compaction.plan(spark, dir, targetBytes = 1L << 30)
      .find(_.partition == "day=a").get.bytes
    val report = Compaction.compact(spark, dir, targetBytes = bytes / 8 + 1,
      zorderBy = Seq("uid", "score"))
    assert(report.partitionsCompacted == 1)

    val after = spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
    assert(after == before, "z-ordered compaction changed the data")

    def scanRows(p: String): Long = {
      val q = spark.read.parquet(p)
        .where(col("uid").between(100L, 220L) && col("score").between(50.0, 140.0))
      q.collect()
      q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head.metrics("numOutputRows").value
    }
    val rows = scanRows(s"$dir/day=a")
    val total = 8000L
    assert(rows * 2 <= total,
      s"z-ordered compaction skipped too little: scanned $rows of $total")
  }
}
