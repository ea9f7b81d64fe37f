package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.CsvIngest.ColumnSpec

class CsvIngestSpec extends SparkSpec {

  private val cols = Seq(
    ColumnSpec("order_id", "STRING"), ColumnSpec("amount", "FLOAT"),
    ColumnSpec("n", "INTEGER"))

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-csv")
    Files.write(dir.resolve("batch.csv"),
      ("order_id,amount,n" +: lines).mkString("\n").getBytes)
    dir.toString
  }

  test("schema-driven load stamps the logical ingestion date") {
    val path = writeCsv("o1,10.5,3", "o2,20.0,4")
    val df = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
    assert(df.count() == 2)
    assert(df.columns.toSeq ==
      Seq("order_id", "amount", "n", "ingestion_date", "ingestion_timestamp"))
    assert(df.select("ingestion_date").distinct().collect()(0).getDate(0).toString == "2024-03-01")
  }

  test("bad records dropped under threshold, load fails above it") {
    val path = writeCsv("o1,10.5,3", "o2,not_a_number,oops")
    val ok = CsvIngest.load(spark, path, cols, maxBadRecords = 1, ingestionDate = "2024-03-01")
    assert(ok.count() == 1)
    intercept[IllegalStateException] {
      CsvIngest.load(spark, path, cols, maxBadRecords = 0, ingestionDate = "2024-03-02").count()
    }
  }

  test("appendPartitioned: re-running a date replaces, not duplicates") {
    val path = writeCsv("o1,10.5,3", "o2,20.0,4")
    val out = Files.createTempDirectory("graft-raw").toString
    val d1 = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
    RawLayer.appendPartitioned(d1, out)
    RawLayer.appendPartitioned(d1, out) // idempotent re-run
    val d2 = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-02")
    RawLayer.appendPartitioned(d2, out) // new partition appends
    val all = spark.read.parquet(out)
    assert(all.count() == 4)
    assert(all.select("ingestion_date").distinct().count() == 2)
  }
}
