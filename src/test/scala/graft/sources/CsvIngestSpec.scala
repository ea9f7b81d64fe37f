package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CsvIngest.ColumnSpec

class CsvIngestSpec extends SparkSpec {

  private val cols = Seq(
    ColumnSpec("order_id", "STRING"), ColumnSpec("amount", "FLOAT"),
    ColumnSpec("n", "INTEGER"))

  private def writeCsv(lines: String*): String = writeHeadless(
    ("order_id,amount,n" +: lines): _*)

  private def writeHeadless(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-csv")
    Files.write(dir.resolve("batch.csv"), lines.mkString("\n").getBytes)
    dir.toString
  }

  test("schema-driven load stamps the logical ingestion date") {
    val path = writeCsv("o1,10.5,3", "o2,20.0,4")
    val df = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01").df
    assert(df.count() == 2)
    assert(df.columns.toSeq ==
      Seq("order_id", "amount", "n", "ingestion_date", "ingestion_timestamp"))
    assert(df.select("ingestion_date").distinct().collect()(0).getDate(0).toString == "2024-03-01")
  }

  test("bad records dropped under threshold, load fails above it — one scan, no cache") {
    val path = writeCsv("o1,10.5,3", "o2,not_a_number,oops")
    val ok = CsvIngest.load(spark, path, cols, maxBadRecords = 1, ingestionDate = "2024-03-01")
    assert(ok.df.count() == 1)
    assert(ok.enforceBadLimit() == 1 && ok.rowsScanned == 2)
    // the clean pass neither caches nor re-scans: no InMemoryRelation
    assert(!ok.df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    val over = CsvIngest.load(spark, path, cols, maxBadRecords = 0, ingestionDate = "2024-03-02")
    over.df.count()
    intercept[IllegalStateException](over.enforceBadLimit())
  }

  test("writeRaw enforces the limit on the write's own scan") {
    val path = writeCsv("o1,10.5,3", "bad,row")
    val out = Files.createTempDirectory("graft-raw-w").toString
    intercept[IllegalStateException] {
      CsvIngest.load(spark, path, cols, maxBadRecords = 0, ingestionDate = "2024-03-01")
        .writeRaw(out)
    }
    // idempotency net: a re-run with a fixed file replaces the partition
    val fixed = writeCsv("o1,10.5,3", "o2,20.0,4")
    val bad = CsvIngest.load(spark, fixed, cols, ingestionDate = "2024-03-01").writeRaw(out)
    assert(bad == 0 && spark.read.parquet(out).count() == 2)
  }

  test("skip_leading_rows=0 reads data from the first line; >1 is refused") {
    val path = writeHeadless("o1,10.5,3", "o2,20.0,4")
    val b = CsvIngest.load(spark, path, cols, skipLeadingRows = 0, ingestionDate = "2024-03-01")
    assert(b.df.count() == 2 && b.badRecords == 0)
    intercept[IllegalArgumentException](
      CsvIngest.load(spark, path, cols, skipLeadingRows = 2, ingestionDate = "2024-03-01"))
  }

  test("allow_jagged_rows tolerates short rows as trailing nulls") {
    val path = writeCsv("o1,10.5,3", "o2,7.5") // second row missing n
    val strict = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
    assert(strict.df.count() == 1 && strict.badRecords == 1)
    val jagged = CsvIngest.load(spark, path, cols, allowJaggedRows = true,
      maxBadRecords = 0, ingestionDate = "2024-03-01")
    val rows = jagged.df.orderBy("order_id").collect()
    assert(jagged.badRecords == 0 && rows.length == 2)
    assert(rows(1).getString(0) == "o2" && rows(1).isNullAt(2)) // n is null
    // a genuine type error is still corrupt even with jagged tolerance
    val mixed = writeCsv("o1,10.5,3", "o2,7.5", "o3,zzz,1")
    val m = CsvIngest.load(spark, mixed, cols, allowJaggedRows = true,
      maxBadRecords = 1, ingestionDate = "2024-03-01")
    assert(m.df.count() == 2 && m.badRecords == 1)
    // ... including a type error in a PRESENT field of a short row
    val shortBad = writeCsv("o1,10.5,3", "o2,zzz")
    val sb = CsvIngest.load(spark, shortBad, cols, allowJaggedRows = true,
      maxBadRecords = 1, ingestionDate = "2024-03-01")
    assert(sb.df.count() == 1 && sb.badRecords == 1)
    // an EMPTY present field is a null, not a type error
    val shortEmpty = writeCsv("o1,10.5,3", "o2,")
    val se = CsvIngest.load(spark, shortEmpty, cols, allowJaggedRows = true,
      ingestionDate = "2024-03-01")
    assert(se.df.count() == 2 && se.badRecords == 0)
  }

  test("metrics before any action fail fast instead of hanging") {
    val path = writeCsv("o1,10.5,3")
    val b = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
    val e = intercept[IllegalStateException](b.badRecords)
    assert(e.getMessage.contains("no action"))
  }

  test("ignore_unknown_values tolerates extra trailing fields") {
    val path = writeCsv("o1,10.5,3,EXTRA", "o2,20.0,4")
    val strict = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
    assert(strict.df.count() == 1 && strict.badRecords == 1)
    val loose = CsvIngest.load(spark, path, cols, ignoreUnknownValues = true,
      ingestionDate = "2024-03-01")
    val rows = loose.df.orderBy("order_id").collect()
    assert(loose.badRecords == 0 && rows.length == 2)
    assert(rows(0).getString(0) == "o1" && rows(0).getLong(2) == 3L) // extras dropped
    // a type error in a declared column is still corrupt despite extras
    val longBad = writeCsv("o1,zzz,3,EXTRA", "o2,20.0,4")
    val lb = CsvIngest.load(spark, longBad, cols, ignoreUnknownValues = true,
      maxBadRecords = 1, ingestionDate = "2024-03-01")
    assert(lb.df.count() == 1 && lb.badRecords == 1)
  }

  test("allow_quoted_newlines parses embedded newlines via multiLine") {
    val dir = Files.createTempDirectory("graft-csv-ml")
    Files.write(dir.resolve("batch.csv"),
      "order_id,amount,n\n\"o1\nwrapped\",10.5,3\no2,20.0,4".getBytes)
    val b = CsvIngest.load(spark, dir.toString, cols, allowQuotedNewlines = true,
      ingestionDate = "2024-03-01")
    val ids = b.df.orderBy("order_id").select("order_id").collect().map(_.getString(0))
    assert(b.badRecords == 0 && ids.length == 2 && ids(0) == "o1\nwrapped")
  }

  test("JSON lines: declared schema, corrupt lines counted, blank lines skipped") {
    val dir = Files.createTempDirectory("graft-json")
    Files.write(dir.resolve("batch.json"), Seq(
      """{"order_id": "o1", "amount": 10.5, "n": 3}""",
      "",
      """{"order_id": "o2", "n": 4}""", // missing key -> null, not corrupt
      """{"order_id": "o3", "amount": "zzz", "n": 1}""", // type error -> corrupt
      """not json at all""",
      """[1, 2, 3]""" // non-object top level -> corrupt
    ).mkString("\n").getBytes)
    val b = JsonIngest.load(spark, dir.toString, cols, maxBadRecords = 3,
      ingestionDate = "2024-03-01")
    // collect unsorted: orderBy would add AQE's range-sample pass over the
    // observed scan and double the accumulated metrics
    val rows = b.df.collect().sortBy(_.getString(0))
    assert(rows.length == 2 && b.badRecords == 3 && b.rowsScanned == 5)
    assert(rows(0).getString(0) == "o1" && rows(0).getDouble(1) == 10.5)
    assert(rows(1).getString(0) == "o2" && rows(1).isNullAt(1))
    assert(b.df.columns.toSeq ==
      Seq("order_id", "amount", "n", "ingestion_date", "ingestion_timestamp"))
    // same single-scan contract as CSV: no second pass, no cache
    assert(!b.df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
  }

  test("JSON lines: unknown keys corrupt unless ignore_unknown_values") {
    val dir = Files.createTempDirectory("graft-json-uk")
    Files.write(dir.resolve("batch.json"), Seq(
      """{"order_id": "o1", "amount": 10.5, "n": 3, "extra": true}""",
      """{"order_id": "o2", "amount": 20.0, "n": 4}"""
    ).mkString("\n").getBytes)
    val strict = JsonIngest.load(spark, dir.toString, cols,
      maxBadRecords = 1, ingestionDate = "2024-03-01")
    assert(strict.df.count() == 1 && strict.badRecords == 1)
    val loose = JsonIngest.load(spark, dir.toString, cols,
      ignoreUnknownValues = true, ingestionDate = "2024-03-01")
    val rows = loose.df.orderBy("order_id").collect()
    assert(loose.badRecords == 0 && rows.length == 2)
    assert(rows(0).getString(0) == "o1" && rows(0).getLong(2) == 3L) // extra dropped
    // a type error in a declared column is still corrupt despite extras
    Files.write(dir.resolve("batch.json"),
      """{"order_id": "o3", "amount": "zzz", "n": 1, "extra": 1}""".getBytes)
    val lb = JsonIngest.load(spark, dir.toString, cols, ignoreUnknownValues = true,
      maxBadRecords = 2, ingestionDate = "2024-03-01")
    lb.df.count()
    assert(lb.badRecords >= 1)
  }

  test("JSON writeRaw: over-limit load publishes nothing; fixed re-run lands") {
    val dir = Files.createTempDirectory("graft-json-w")
    Files.write(dir.resolve("batch.json"), Seq(
      """{"order_id": "o1", "amount": 10.5, "n": 3}""",
      """broken"""
    ).mkString("\n").getBytes)
    val out = Files.createTempDirectory("graft-json-raw").toString
    intercept[IllegalStateException] {
      JsonIngest.load(spark, dir.toString, cols, maxBadRecords = 0,
        ingestionDate = "2024-03-01").writeRaw(out)
    }
    // staged publish: the failed load left NO data (and no staging debris)
    assert(new java.io.File(out).listFiles() == null ||
      new java.io.File(out).listFiles().isEmpty)
    Files.write(dir.resolve("batch.json"),
      """{"order_id": "o1", "amount": 10.5, "n": 3}""".getBytes)
    val bad = JsonIngest.load(spark, dir.toString, cols,
      ingestionDate = "2024-03-01").writeRaw(out)
    assert(bad == 0 && spark.read.parquet(out).count() == 1)
  }

  test("Ingest dispatcher routes by source_format; AVRO and unknown fail fast") {
    val csvPath = writeCsv("o1,10.5,3")
    val viaCsv = Ingest.load(spark, csvPath, cols, sourceFormat = "CSV",
      ingestionDate = "2024-03-01")
    assert(viaCsv.df.count() == 1)
    val jdir = Files.createTempDirectory("graft-json-fmt")
    Files.write(jdir.resolve("b.json"),
      """{"order_id": "o1", "amount": 1.0, "n": 2}""".getBytes)
    val viaJson = Ingest.load(spark, jdir.toString, cols,
      sourceFormat = "NEWLINE_DELIMITED_JSON", ingestionDate = "2024-03-01")
    assert(viaJson.df.count() == 1 && viaJson.badRecords == 0)
    // PARQUET: self-describing, n_bad structurally 0
    val pdir = Files.createTempDirectory("graft-pq-fmt").toString + "/t"
    viaJson.df.drop("ingestion_date", "ingestion_timestamp").write.parquet(pdir)
    val viaPq = Ingest.load(spark, pdir, cols, sourceFormat = "PARQUET",
      ingestionDate = "2024-03-02")
    assert(viaPq.df.count() == 1 && viaPq.badRecords == 0)
    // ORC: self-describing like parquet (BigQuery source_format=ORC)
    val odir = Files.createTempDirectory("graft-orc-fmt").toString + "/t"
    viaJson.df.drop("ingestion_date", "ingestion_timestamp")
      .write.format("orc").save(odir)
    val viaOrc = Ingest.load(spark, odir, cols, sourceFormat = "ORC",
      ingestionDate = "2024-03-03")
    assert(viaOrc.df.count() == 1 && viaOrc.badRecords == 0)
    assert(viaOrc.df.select("order_id", "amount", "n")
      .collect().toSeq == viaPq.df.select("order_id", "amount", "n")
      .collect().toSeq)
    intercept[IllegalArgumentException](
      Ingest.load(spark, csvPath, cols, sourceFormat = "CSVX",
        ingestionDate = "2024-03-01"))
  }

  private def writeAvro(dir: java.nio.file.Path, name: String,
                        schema: org.apache.avro.Schema)(
      rows: Map[String, Any]*): Unit = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, dir.resolve(name).toFile)
    rows.foreach { vals =>
      val r = new GenericData.Record(schema)
      vals.foreach { case (k, v) => r.put(k, v) }
      w.append(r)
    }
    w.close()
  }

  private val avroWriterSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse("""{
      "type": "record", "name": "batch", "fields": [
        {"name": "order_id", "type": ["null", "string"], "default": null},
        {"name": "amount", "type": "float"},
        {"name": "n", "type": "int"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "ok", "type": "boolean"},
        {"name": "extra_writer_field", "type": "string"}
      ]}""")

  test("AVRO: dispatcher-routed load, logical date/timestamp, missing->null, extra ignored") {
    val avroCols = cols ++ Seq(ColumnSpec("d", "DATE"),
      ColumnSpec("ts", "TIMESTAMP"), ColumnSpec("ok", "BOOLEAN"),
      ColumnSpec("not_in_writer", "STRING"))
    val dir = Files.createTempDirectory("graft-avro")
    writeAvro(dir, "b.avro", avroWriterSchema)(
      Map("order_id" -> "o1", "amount" -> 10.5f, "n" -> 3,
        "d" -> 19845, // 2024-05-02
        "ts" -> 1714646400000000L, // 2024-05-02T10:40:00Z in micros
        "ok" -> true, "extra_writer_field" -> "dropped"),
      Map("order_id" -> null, "amount" -> 1.25f, "n" -> 7,
        "d" -> 0, "ts" -> 0L, "ok" -> false, "extra_writer_field" -> "x"))
    val loaded = Ingest.load(spark, dir.toString, avroCols,
      sourceFormat = "AVRO", ingestionDate = "2024-03-01")
    // no orderBy before reading metrics: a global sort's range-partitioner
    // sample re-runs the scan and double-counts the observation (documented
    // Loaded caveat) — sort driver-side instead
    val out = loaded.df.collect().sortBy(_.getAs[Long]("n"))
    assert(loaded.badRecords == 0 && loaded.rowsScanned == 2)
    assert(out.length == 2)
    val r = out(0)
    assert(r.getAs[String]("order_id") == "o1")
    assert(r.getAs[Double]("amount") == 10.5) // float widened
    assert(r.getAs[Long]("n") == 3L)          // int widened
    assert(r.getAs[java.sql.Date]("d").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19845))
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.ofEpochSecond(1714646400L))
    assert(r.getAs[Boolean]("ok"))
    assert(r.getAs[String]("not_in_writer") == null) // missing nullable -> NULL
    assert(out(1).getAs[String]("order_id") == null) // avro null rides through
    assert(r.getAs[java.sql.Date]("ingestion_date").toString == "2024-03-01")

    // dispositions flow like every other format: staged publish + re-load
    val target = Files.createTempDirectory("graft-avro-raw").toString + "/t"
    intercept[IllegalStateException](Ingest.load(spark, dir.toString, avroCols,
        sourceFormat = "AVRO", ingestionDate = "2024-03-01")
      .writeRaw(target, createDisposition = "CREATE_NEVER"))
    assert(Ingest.load(spark, dir.toString, avroCols, sourceFormat = "AVRO",
      ingestionDate = "2024-03-01").writeRaw(target) == 0)
    assert(spark.read.parquet(target).count() == 2)
  }

  test("AVRO: bad schema fails AT load() on the driver, before any task runs") {
    val dir = Files.createTempDirectory("graft-avro-pre")
    writeAvro(dir, "b.avro", avroWriterSchema)(
      Map("order_id" -> "o1", "amount" -> 1.0f, "n" -> 1, "d" -> 0,
        "ts" -> 0L, "ok" -> true, "extra_writer_field" -> "x"))
    // the load is LAZY — if load() itself throws, no job and no task ever
    // ran (the r8 behavior surfaced these as task failures at count())
    val mismatched = cols ++ Seq(ColumnSpec("ok", "STRING"))
    val e = intercept[IllegalArgumentException] {
      Ingest.load(spark, dir.toString, mismatched, sourceFormat = "AVRO",
        ingestionDate = "2024-03-01")
    }
    assert(e.getMessage.contains("before any task ran"), e.getMessage)

    // multi-branch union: rejected from the same driver-side pre-read
    val unionDir = Files.createTempDirectory("graft-avro-union")
    val unionSchema = new org.apache.avro.Schema.Parser().parse("""{
      "type": "record", "name": "u", "fields": [
        {"name": "order_id", "type": ["null", "string", "long"], "default": null},
        {"name": "amount", "type": "float"},
        {"name": "n", "type": "int"}
      ]}""")
    writeAvro(unionDir, "u.avro", unionSchema)(
      Map("order_id" -> "o1", "amount" -> 1.0f, "n" -> 1))
    val u = intercept[IllegalArgumentException] {
      Ingest.load(spark, unionDir.toString, cols, sourceFormat = "AVRO",
        ingestionDate = "2024-03-01")
    }
    assert(u.getMessage.contains("non-null branches"), u.getMessage)

    // a GOOD schema still pre-validates clean and loads
    val okDir = Files.createTempDirectory("graft-avro-ok")
    writeAvro(okDir, "b.avro", avroWriterSchema)(
      Map("order_id" -> "o1", "amount" -> 1.0f, "n" -> 1, "d" -> 0,
        "ts" -> 0L, "ok" -> true, "extra_writer_field" -> "x"))
    assert(Ingest.load(spark, okDir.toString, cols, sourceFormat = "AVRO",
      ingestionDate = "2024-03-01").df.count() == 1)
  }

  test("AVRO: declared-type mismatch fails the load (self-describing semantics)") {
    val dir = Files.createTempDirectory("graft-avro-bad")
    writeAvro(dir, "b.avro", avroWriterSchema)(
      Map("order_id" -> "o1", "amount" -> 1.0f, "n" -> 1, "d" -> 0,
        "ts" -> 0L, "ok" -> true, "extra_writer_field" -> "x"))
    // 'ok' (boolean) declared as STRING: fail, never coerce
    val mismatched = cols ++ Seq(ColumnSpec("ok", "STRING"))
    val e = intercept[Exception] {
      Ingest.load(spark, dir.toString, mismatched, sourceFormat = "AVRO",
        ingestionDate = "2024-03-01").df.count()
    }
    assert(e.getMessage != null)
  }

  test("create_disposition: CREATE_NEVER fails on a missing target, passes on existing") {
    val path = writeCsv("o1,10.5,3")
    val missing = Files.createTempDirectory("graft-cd").toString + "/nope"
    intercept[IllegalStateException] {
      CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
        .writeRaw(missing, createDisposition = "CREATE_NEVER")
    }
    assert(!new java.io.File(missing).exists()) // fail-fast, nothing written
    val existing = Files.createTempDirectory("graft-cd-ok").toString
    val bad = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
      .writeRaw(existing, createDisposition = "CREATE_NEVER")
    assert(bad == 0 && spark.read.parquet(existing).count() == 1)
    intercept[IllegalArgumentException] {
      CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01")
        .writeRaw(existing, createDisposition = "CREATE_WHENEVER")
    }
  }

  test("writeRaw staged publish: failed CSV load leaves the raw layer untouched") {
    val out = Files.createTempDirectory("graft-stage").toString
    val good = writeCsv("o1,10.5,3", "o2,20.0,4")
    CsvIngest.load(spark, good, cols, ingestionDate = "2024-03-01").writeRaw(out)
    assert(spark.read.parquet(out).count() == 2)
    // an over-limit day 2 load must not disturb day 1's published data
    val broken = writeCsv("o3,zzz,9")
    intercept[IllegalStateException] {
      CsvIngest.load(spark, broken, cols, maxBadRecords = 0,
        ingestionDate = "2024-03-02").writeRaw(out)
    }
    val after = spark.read.parquet(out)
    assert(after.count() == 2 &&
      after.select("ingestion_date").distinct().count() == 1)
    // no staging debris either
    assert(!new java.io.File(out).listFiles().map(_.getName).exists(_.startsWith("_staging")))
  }

  test("appendPartitioned: re-running a date replaces, not duplicates") {
    val path = writeCsv("o1,10.5,3", "o2,20.0,4")
    val out = Files.createTempDirectory("graft-raw").toString
    val d1 = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-01").df
    RawLayer.appendPartitioned(d1, out)
    RawLayer.appendPartitioned(d1, out) // idempotent re-run
    val d2 = CsvIngest.load(spark, path, cols, ingestionDate = "2024-03-02").df
    RawLayer.appendPartitioned(d2, out) // new partition appends
    val all = spark.read.parquet(out)
    assert(all.count() == 4)
    assert(all.select("ingestion_date").distinct().count() == 2)
    // the overwrite mode must be a per-write option, never session state:
    // a session-level set would leak partition-grain overwrite semantics
    // into every other suite sharing this SparkSession (mirror of the
    // StreamingSpec guard on StreamSink.writeBatch)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        .equalsIgnoreCase("static"),
      "appendPartitioned must not mutate session partitionOverwriteMode")
  }
}
