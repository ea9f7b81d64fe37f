package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.BucketIndex

/** Z-order clustering ([[ZOrder]]): the bucketize/interleave kernels, and
  * the actual data-skipping effect — a 2-D selective predicate over the
  * clustered layout must materialize a FRACTION of the rows the same scan
  * reads from an uncorrelated layout, at identical query results.
  */
class ZOrderSpec extends SparkSpec {

  test("BucketIndex.indexOf: boundaries, ties, ends") {
    val cuts = Array(1.0, 2.0, 5.0)
    assert(BucketIndex.indexOf(0.5, cuts) == 0)
    assert(BucketIndex.indexOf(1.0, cuts) == 1) // cut <= v counts
    assert(BucketIndex.indexOf(1.5, cuts) == 1)
    assert(BucketIndex.indexOf(5.0, cuts) == 3)
    assert(BucketIndex.indexOf(99.0, cuts) == 3)
  }

  test("interleaveBits round-robins dimension bits") {
    import spark.implicits._
    // x=0b10, y=0b01, 2 bits: z bits are x1 y1 x0 y0 = 1,0,0,1 = 9
    val z = Seq((2, 1)).toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(z == 9L, s"expected 0b1001, got $z")
  }

  test("zvalue buckets are equi-populated on skewed data") {
    import spark.implicits._
    // heavy-tailed values: equi-WIDTH buckets would dump ~all rows in one
    // bucket; quantile buckets must spread them
    val df = (1 to 4096).map(i => math.pow(i.toDouble, 4)).toDF("v")
    val counts = df.select(ZOrder.zvalue(df, Seq("v"), bits = 4).as("z"))
      .groupBy("z").count().select("count").as[Long].collect()
    assert(counts.length == 16, s"expected 16 buckets, got ${counts.length}")
    assert(counts.max <= 2L * counts.min,
      s"quantile buckets badly skewed: min=${counts.min} max=${counts.max}")
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

  test("2-D predicate skips most files on the clustered layout, none on the naive one") {
    // sf0.01: 10k events over ~150 users — enough rows for 16 real files
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select("event_id", "user_id", "value")
    val root = Files.createTempDirectory("graft-zorder").toString
    // naive layout: clustered by event_id (uncorrelated with user/value),
    // so every file's (user_id, value) min-max spans ~the full range
    ev.repartitionByRange(16, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.parquet(s"$root/naive")
    ZOrder.writeClustered(ev, Seq("user_id", "value"), s"$root/zorder", nFiles = 16)

    // probe box derived from the data's own quantiles (~15% of users x
    // ~20% of values ≈ 3% selectivity) so testdata regeneration can't
    // strand the box outside the populated range again
    val qs = ev.selectExpr("CAST(user_id AS DOUBLE) AS u", "value")
      .stat.approxQuantile(Array("u", "value"),
        Array(0.2, 0.35, 0.1, 0.3), 0.001)
    val (uLo, uHi) = (qs(0)(0).toLong, qs(0)(1).toLong)
    val (vLo, vHi) = (qs(1)(2), qs(1)(3))
    def query(path: String): DataFrame =
      spark.read.parquet(path)
        .where(col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))

    // identical results first — layout must never change semantics
    val a = query(s"$root/naive").orderBy("event_id").collect().toSeq
    val b = query(s"$root/zorder").orderBy("event_id").collect().toSeq
    assert(a == b, "clustered layout changed query results")
    assert(a.nonEmpty, "sanity: the probe box should match some events")

    val naive = scanRows(query(s"$root/naive"))
    val z = scanRows(query(s"$root/zorder"))
    val total = ev.count()
    // naive layout cannot skip: every file's stats straddle the predicate
    assert(naive == total,
      s"naive layout unexpectedly skipped rows: $naive of $total")
    assert(z * 2 <= naive,
      s"z-order skipped too little: scanned $z of $naive naive rows")
    info(f"scan materialized: naive=$naive z-order=$z (${z.toDouble / naive}%.2f of naive)")
  }

  test("row counts and contents survive clustering (no rows lost or duplicated)") {
    import spark.implicits._
    val ev = Tables.load(spark, sf001, "events").select("event_id", "user_id", "value")
    val root = Files.createTempDirectory("graft-zorder2").toString
    ZOrder.writeClustered(ev, Seq("user_id", "value"), s"$root/z", nFiles = 8)
    val back = spark.read.parquet(s"$root/z")
    assert(back.count() == ev.count())
    assert(back.select("event_id").as[Long].collect().sorted.toSeq ==
      ev.select("event_id").as[Long].collect().sorted.toSeq)
    assert(!back.schema.fieldNames.contains("_z"), "helper column leaked into the layout")
  }

  test("a user column named _z survives clustering (collision-proof staging name)") {
    import spark.implicits._
    val df = Seq((1L, 10.0, "keep-a"), (2L, 20.0, "keep-b"), (3L, 30.0, "keep-c"))
      .toDF("id", "value", "_z")
    val root = Files.createTempDirectory("graft-zorder3").toString
    ZOrder.writeClustered(df, Seq("id", "value"), s"$root/z", nFiles = 2)
    val back = spark.read.parquet(s"$root/z")
    assert(back.schema.fieldNames.sorted.toSeq == Seq("_z", "id", "value"))
    assert(back.select("_z").as[String].collect().sorted.toSeq ==
      Seq("keep-a", "keep-b", "keep-c"),
      "user _z column was clobbered by the staging z-value")
  }

  test("zvalue names the offending column when it has no non-null values") {
    val df = spark.range(10).selectExpr("id", "CAST(NULL AS DOUBLE) AS dead")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zvalue(df, Seq("id", "dead"))
    }
    assert(e.getMessage.contains("dead"), s"error should name the column: ${e.getMessage}")
  }

  test("nulls land in bucket 0: null rows cluster at the curve's low end") {
    val df = spark.range(100)
      .selectExpr("id", "IF(id < 5, CAST(NULL AS DOUBLE), CAST(id AS DOUBLE)) AS v")
    val z = ZOrder.zvalue(df, Seq("v"))
    val rows = df.select(df("id"), z.as("z")).collect()
    val nullZ = rows.filter(_.getLong(0) < 5).map(_.getLong(1)).toSet
    assert(nullZ == Set(0L), s"null rows should get z-value 0, got $nullZ")
  }
}
