package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata schema tripwire (r11 post-mortem): a driver-side regeneration of
  * the parquet testdata changed `events.ts` from INT64 nanos to timestamp[us]
  * mid-round and surfaced as 9 scattered gate-query analysis errors plus 2
  * test failures. This spec makes the NEXT drift fail in seconds with one
  * named diagnostic per table/column, via the declared-schema registry that
  * `Tables.load` now validates against.
  */
class SchemaDriftSpec extends SparkSpec {

  test("every driver table at sf0.001 loads and matches the declared registry") {
    // Tables.load itself throws a named `testdata schema drift` error on
    // mismatch; loading all ten is the tripwire.
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sf001, n)
      val declared = Tables.declared(n).map(_._1)
      val actual = df.schema.fieldNames.toSeq
      assert(actual == declared,
        s"table '$n': column order drifted — found ${actual.mkString(",")}, declared ${declared.mkString(",")}")
    }
  }

  test("events.ts is normalized to µs TimestampType whatever the on-disk encoding") {
    assert(Tables.load(spark, sf001, "events").schema("ts").dataType == TimestampType)
    // and the values are sane instants, not garbled by a wrong ns/µs branch
    val (lo, hi) = Tables.load(spark, sf001, "events")
      .agg(min(year(col("ts"))), max(year(col("ts")))).as[(Int, Int)](
        org.apache.spark.sql.Encoders.product[(Int, Int)]).head()
    assert(lo >= 1970 && hi <= 2100, s"events.ts year range [$lo, $hi] is implausible")
  }

  test("the legacy INT64-nanos encoding still loads through the same path") {
    // simulate the pre-r11 on-disk encoding: ts as raw LongType nanos
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Tables.load(spark, sf001, "events")
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = Tables.load(spark, dir, "events")
    assert(back.schema("ts").dataType == TimestampType)
    val orig = Tables.load(spark, sf001, "events").agg(sum(unix_micros(col("ts")))).head().getLong(0)
    val rt = back.agg(sum(unix_micros(col("ts")))).head().getLong(0)
    assert(rt == orig, "ns->µs coercion changed timestamp values")
  }

  test("a drifted column type fails with one named diagnostic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift2").toString
    Tables.load(spark, sf001, "events")
      .withColumn("ts", col("ts").cast(StringType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[RuntimeException](Tables.load(spark, dir, "events"))
    assert(e.getMessage.contains("testdata schema drift"), e.getMessage)
    assert(e.getMessage.contains("'events'") && e.getMessage.contains("'ts'"), e.getMessage)
  }

  test("a missing declared column fails with one named diagnostic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift3").toString
    Tables.load(spark, sf001, "region").drop("r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[RuntimeException](Tables.load(spark, dir, "region"))
    assert(e.getMessage.contains("testdata schema drift"), e.getMessage)
    assert(e.getMessage.contains("'r_name'"), e.getMessage)
  }
}
