package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven file ingestion into the parquet raw layer.
  *
  * Re-expresses the reference's GCSBigQueryOperator
  * (/root/reference/utils/operators.py:11-96): declared schema, source
  * formats, create/write dispositions, delimiter/leading-row handling,
  * jagged-row / quoted-newline / unknown-value tolerance, bad-record
  * limits, and an `ingestion_timestamp` partition column — but Spark-first:
  * the scan is distributed, PERMISSIVE-mode corrupt rows are counted via an
  * [[Observation]] on the SAME scan that writes (no cache of the raw input,
  * no second pass — at 100 TB/day a side-count must not cost a
  * materialization), and the "table" is a date-partitioned parquet
  * directory where idempotent re-loads use partition-grain replacement
  * instead of MERGE. Writes stage under a hidden `_staging_*` prefix and
  * publish per-partition only after the bad-record limit passes, so a
  * failed load never leaves partial data visible to raw-layer readers
  * (BigQuery aborts the load job atomically; this is the parquet analogue).
  */
object CsvIngest {

  /** Mirror of the reference's YAML column spec (name + BigQuery-ish type). */
  case class ColumnSpec(name: String, colType: String) {
    def sparkType: DataType = colType.toUpperCase match {
      case "STRING" => StringType
      case "INTEGER" | "INT64" => LongType
      case "FLOAT" | "FLOAT64" => DoubleType
      case "DATE" => DateType
      case "TIMESTAMP" => TimestampType
      case "BOOLEAN" | "BOOL" => BooleanType
      case other => throw new IllegalArgumentException(s"unknown type $other")
    }
  }

  def schemaOf(cols: Seq[ColumnSpec]): StructType =
    StructType(cols.map(c => StructField(c.name, c.sparkType, nullable = true)))

  /** Load a CSV batch with a declared schema — one scan, lazy.
    *
    * @param skipLeadingRows reference `skip_leading_rows`: 1 = first line is
    *   a header (Spark's header option), 0 = data starts at byte 0. Values
    *   > 1 are refused: Spark's distributed CSV split has no "skip N
    *   arbitrary lines" notion, and silently approximating it would drop
    *   data rows.
    * @param allowQuotedNewlines reference `allow_quoted_newlines`: parse
    *   newlines inside quoted fields (Spark `multiLine`). NOTE this makes
    *   each file single-split on read, same as BigQuery's loader — keep
    *   files small when enabling.
    * @param allowJaggedRows reference `allow_jagged_rows`: tolerate rows
    *   with FEWER fields than the schema (missing trailing values read as
    *   null) instead of counting them corrupt.
    * @param ignoreUnknownValues reference `ignore_unknown_values`: tolerate
    *   rows with MORE fields than the schema (extras discarded).
    * @param maxBadRecords fail the load when more rows than this remain
    *   corrupt after the tolerances; corrupt rows are dropped otherwise.
    * @param ingestionDate the load's logical date (reference `{{ ds }}`) —
    *   stamped, not wall-clock, so backfills are deterministic and re-runs
    *   idempotent.
    */
  def load(spark: SparkSession, path: String, cols: Seq[ColumnSpec],
           delimiter: String = ",", skipLeadingRows: Int = 1,
           maxBadRecords: Int = 0, allowJaggedRows: Boolean = false,
           allowQuotedNewlines: Boolean = false,
           ignoreUnknownValues: Boolean = false,
           ingestionDate: String): Loaded = {
    require(skipLeadingRows == 0 || skipLeadingRows == 1,
      s"skipLeadingRows=$skipLeadingRows unsupported: a distributed CSV split " +
        "cannot skip arbitrary leading lines; preprocess the file instead")
    require(cols.nonEmpty, "CSV schema must declare at least one column")
    val schema = schemaOf(cols).add("_corrupt_record", StringType)
    val raw = spark.read
      .schema(schema)
      .option("header", (skipLeadingRows == 1).toString)
      .option("sep", delimiter)
      .option("multiLine", allowQuotedNewlines.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

    // Field-count heuristic on the raw record distinguishes jagged/extra
    // rows (tolerable by option) from genuine parse failures. PERMISSIVE
    // mode has already null-padded short rows and truncated long ones, so
    // "tolerate" is just "keep" — but ONLY when every field that IS
    // present parsed (or was empty): BigQuery's jagged/unknown tolerances
    // never forgive a type error in a declared column, and neither must
    // this. (The naive split miscounts delimiters inside quoted fields;
    // such rows stay classified corrupt — the conservative direction.)
    val rawFields = split(col("_corrupt_record"),
      java.util.regex.Pattern.quote(delimiter))
    val nFields = size(rawFields)
    val presentParsed = cols.zipWithIndex.map { case (c, i) =>
      lit(i) >= nFields || col(c.name).isNotNull ||
        length(element_at(rawFields, i + 1)) === 0
    }.reduce(_ && _)
    var tolerated = lit(false)
    if (allowJaggedRows) tolerated = tolerated || (nFields < cols.size && presentParsed)
    if (ignoreUnknownValues) tolerated = tolerated || (nFields > cols.size && presentParsed)
    val keep = col("_corrupt_record").isNull || tolerated

    // The _pin metric references EVERY data column on purpose, for two
    // parser-pruning reasons: (1) CSV scans whose only required column is
    // `_corrupt_record` are disallowed (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    // which is what a count-pruned action on the filtered frame would
    // otherwise need; (2) the CSV parser only type-checks the columns it is
    // asked for, so a pruned scan would MISS corrupt rows — the bad count
    // must reflect the full declared schema on every action, like the
    // BigQuery load it mirrors. (Must not be a count(non-nullable): that
    // gets optimized to count(1), erasing the references.)
    val obs = Observation()
    val observed = raw.observe(obs,
      count(when(!keep, 1)).as("n_bad"),
      count(lit(1)).as("n_rows"),
      max(length(concat_ws("", cols.map(c => col(c.name).cast("string")): _*)))
        .as("_pin"))
    val out = observed
      .where(keep)
      .drop("_corrupt_record")
      .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
      .withColumn("ingestion_timestamp", lit(s"$ingestionDate 00:00:00").cast("timestamp"))
    new Loaded(out, obs, "CSV", path, maxBadRecords)
  }
}

/** Newline-delimited JSON ingestion with the same contract as
  * [[CsvIngest.load]] (reference `source_format='NEWLINE_DELIMITED_JSON'`,
  * `utils/operators.py:20,57`): declared schema, PERMISSIVE corrupt
  * counting on the single scan, `ignore_unknown_values`, bad-record limit,
  * stamped partition columns, staged partitioned write.
  */
object JsonIngest {

  import CsvIngest.{ColumnSpec, schemaOf}

  /** Load a JSON-lines batch — one distributed text scan, lazy.
    *
    * Parsing runs through `from_json` over a text scan (not the JSON
    * reader) so the raw line stays available for the unknown-key check:
    * BigQuery counts a row with keys outside the declared schema as bad
    * unless `ignore_unknown_values` — Spark's JSON reader silently drops
    * unknown keys and could not express the strict side. Blank lines are
    * skipped (BigQuery ignores them). Missing keys and JSON nulls read as
    * SQL nulls (BigQuery NULLABLE semantics); a malformed line or a type
    * error in a DECLARED column is corrupt.
    */
  def load(spark: SparkSession, path: String, cols: Seq[ColumnSpec],
           maxBadRecords: Int = 0, ignoreUnknownValues: Boolean = false,
           ingestionDate: String): Loaded = {
    require(cols.nonEmpty, "JSON schema must declare at least one column")
    val schema = schemaOf(cols).add("_corrupt_record", StringType)
    val raw = spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .withColumn("_p", from_json(col("value"), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")))

    // json_object_keys is null for anything but a JSON object — a scalar /
    // array / malformed top level is corrupt regardless of tolerances.
    val keys = json_object_keys(col("value"))
    val declared = array(cols.map(c => lit(c.name)): _*)
    val unknown = size(array_except(keys, declared)) > 0
    val parseOk = keys.isNotNull && col("_p._corrupt_record").isNull
    val keep = parseOk && (if (ignoreUnknownValues) lit(true) else !unknown)

    // Same single-scan observe contract as the CSV loader. No _pin needed:
    // every metric references _p/value, and a text scan has exactly one
    // physical column, so no pruning can skip the parse.
    val obs = Observation()
    val observed = raw.observe(obs,
      count(when(!keep, 1)).as("n_bad"),
      count(lit(1)).as("n_rows"))
    val out = observed
      .where(keep)
      .select(cols.map(c => col(s"_p.${c.name}").as(c.name)): _*)
      .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
      .withColumn("ingestion_timestamp", lit(s"$ingestionDate 00:00:00").cast("timestamp"))
    new Loaded(out, obs, "JSON", path, maxBadRecords)
  }
}

/** AVRO raw ingest (reference accepts `source_format=AVRO`,
  * `utils/operators.py:57`). The spark-avro connector module is not on
  * this classpath, so the scan is built directly on Avro's own Hadoop
  * input format (`avro-mapred`, which Spark ships): container files split
  * at sync markers — the scan stays distributed and splittable like any
  * other raw-layer source, no whole-file reads. Records convert to the
  * DECLARED schema strictly: Avro is self-describing, so like PARQUET
  * (and BigQuery's Avro loader) a type mismatch fails the load rather
  * than counting bad records — `n_bad` is structurally 0. Missing
  * nullable fields read as SQL NULL; writer-side extra fields are
  * ignored (Avro loads never reject unknown fields, `operators.py`
  * passes no `ignore_unknown_values` for AVRO).
  */
object AvroIngest {

  import org.apache.avro.Schema
  import org.apache.avro.generic.GenericRecord

  import CsvIngest.{ColumnSpec, schemaOf}

  def load(spark: SparkSession, path: String, cols: Seq[ColumnSpec],
           maxBadRecords: Int = 0, ingestionDate: String): Loaded = {
    require(cols.nonEmpty, "AVRO schema must declare at least one column")
    preValidate(spark, path, cols)
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[GenericRecord]],
        classOf[org.apache.avro.mapred.AvroKey[GenericRecord]],
        classOf[org.apache.hadoop.io.NullWritable])
      // the record reader REUSES the datum across records: convert to Row
      // inside the same pass, never hold the GenericRecord. Field positions
      // and union branches resolve ONCE per writer schema object (stable
      // per split, identity-keyed in case a partition spans files), not via
      // a per-row per-column name lookup.
      .mapPartitions { it =>
        val plans = new java.util.IdentityHashMap[Schema, Array[(Int, Schema)]]()
        it.map { case (k, _) =>
          val rec = k.datum()
          val ws = rec.getSchema
          var plan = plans.get(ws)
          if (plan == null) { plan = fieldPlan(ws, cols); plans.put(ws, plan) }
          toRow(rec, cols, plan)
        }
      }
    val obs = Observation()
    val out = spark.createDataFrame(rdd, schemaOf(cols))
      .observe(obs, count(when(lit(false), 1)).as("n_bad"),
        count(lit(1)).as("n_rows"))
      .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
      .withColumn("ingestion_timestamp",
        lit(s"$ingestionDate 00:00:00").cast("timestamp"))
    new Loaded(out, obs, "AVRO", path, maxBadRecords)
  }

  /** Driver-side fail-fast: read ONE file's writer schema (a few KB of
    * container header — no task launched, no data block read) and reject
    * multi-branch unions and statically-decidable type mismatches at
    * `load()` call time, the way BigQuery's loader fails at job submission
    * rather than mid-load. Distributed-side checks stay: files after the
    * first may carry a different writer schema, and [[convert]] still
    * guards every record. A path with no readable Avro file is left to the
    * normal scan (same error surface as before). */
  private def preValidate(spark: SparkSession, path: String,
                          cols: Seq[ColumnSpec]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val first: Option[org.apache.hadoop.fs.Path] =
      try {
        val stats = fs.globStatus(p) match {
          case null => Array.empty[org.apache.hadoop.fs.FileStatus]
          case s => s
        }
        stats.flatMap { st =>
          if (st.isFile) Array(st.getPath)
          else fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath)
        }.filterNot { f =>
          val n = f.getName
          n.startsWith("_") || n.startsWith(".")
        }.sortBy(_.getName).headOption
      } catch { case _: java.io.IOException => None }
    first.foreach { f =>
      val in = fs.open(f)
      val ws =
        try {
          val reader = new org.apache.avro.file.DataFileStream(in,
            new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
          try reader.getSchema finally reader.close()
        } catch {
          case _: java.io.IOException => return // not an Avro container: let the scan report it
        } finally {
          try in.close() catch { case _: java.io.IOException => () }
        }
      cols.foreach { c =>
        val field = ws.getField(c.name)
        if (field != null) {
          val branch = nonNullBranch(c.name, field.schema()) // throws on multi-branch unions
          if (!staticallyCompatible(branch, c))
            throw new IllegalArgumentException(
              s"AVRO field '${c.name}': writer type ${branch.getType}" +
                s"${Option(branch.getLogicalType).map(" (" + _.getName + ")").getOrElse("")} " +
                s"does not load as declared ${c.colType} " +
                s"(rejected at load() from ${f.getName}'s writer schema, " +
                "before any task ran)")
        }
      }
    }
  }

  /** The writer-schema/declared-type combinations [[convert]] accepts,
    * decided statically (mirror the runtime matrix exactly — anything the
    * pre-check passes must convert, anything it rejects would have failed
    * per-record anyway). */
  private def staticallyCompatible(fs: Schema, c: ColumnSpec): Boolean = {
    import Schema.Type._
    val logical = Option(fs.getLogicalType).map(_.getName)
    (c.sparkType, fs.getType) match {
      case (StringType, STRING | ENUM) => true
      case (LongType, INT) => true
      case (LongType, LONG) => logical.isEmpty
      case (DoubleType, FLOAT | DOUBLE) => true
      case (BooleanType, BOOLEAN) => true
      case (DateType, INT) => logical.contains("date")
      case (TimestampType, LONG) =>
        logical.forall(Set("timestamp-micros", "timestamp-millis"))
      case _ => false
    }
  }

  /** Position + resolved branch schema per declared column for one writer
    * schema; pos -1 = field absent in the writer (reads as NULL). */
  private def fieldPlan(ws: Schema, cols: Seq[ColumnSpec]): Array[(Int, Schema)] =
    cols.map { c =>
      val field = ws.getField(c.name)
      if (field == null) (-1, null: Schema)
      else (field.pos(), nonNullBranch(c.name, field.schema()))
    }.toArray

  private def toRow(rec: GenericRecord, cols: Seq[ColumnSpec],
                    plan: Array[(Int, Schema)]): org.apache.spark.sql.Row = {
    val vals = new Array[Any](cols.length)
    var i = 0
    while (i < vals.length) {
      val (pos, branch) = plan(i)
      vals(i) = if (pos < 0) null else convert(rec.get(pos), cols(i), branch)
      i += 1
    }
    org.apache.spark.sql.Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  /** Unions are transparent at runtime; logical types hang off the
    * non-null branch. Only `["null", type]` unions are accepted — with two
    * or more non-null branches there is no single branch to type-check a
    * runtime value against, so the load rejects the schema (the same
    * restriction BigQuery's Avro loader imposes). Timing: [[preValidate]]
    * reads the FIRST file's writer schema on the driver at `load()` time,
    * so a bad schema fails before any task launches; files beyond the
    * first (a mixed-schema directory) are still caught here, per split,
    * at first-record time. */
  private def nonNullBranch(name: String, s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      import scala.jdk.CollectionConverters._
      s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toList match {
        case only :: Nil => only
        case Nil => s
        case many => throw new IllegalArgumentException(
          s"AVRO field '$name': union with ${many.size} non-null branches " +
            "(" + many.map(_.getType).mkString(", ") + ") is not supported; " +
            "only [\"null\", type] unions load")
      }
    } else s

  private def convert(v: Any, c: ColumnSpec, fs: Schema): Any = {
    def fail(): Nothing = throw new IllegalArgumentException(
      s"AVRO field '${c.name}': writer type ${fs.getType}" +
        s"${Option(fs.getLogicalType).map(" (" + _.getName + ")").getOrElse("")} " +
        s"does not load as declared ${c.colType} " +
        "(self-describing formats fail on schema mismatch)")
    if (v == null) null
    else (c.sparkType, v) match {
      case (StringType, s: org.apache.avro.util.Utf8) => s.toString
      case (StringType, s: String) => s
      case (StringType, e: org.apache.avro.generic.GenericEnumSymbol[_]) => e.toString
      case (LongType, i: java.lang.Integer) => i.longValue()
      case (LongType, l: java.lang.Long)
          if fs.getLogicalType == null => l.longValue()
      case (DoubleType, f: java.lang.Float) => f.doubleValue()
      case (DoubleType, d: java.lang.Double) => d.doubleValue()
      case (BooleanType, b: java.lang.Boolean) => b.booleanValue()
      // logical date: int days since epoch
      case (DateType, i: java.lang.Integer)
          if fs.getLogicalType != null && fs.getLogicalType.getName == "date" =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
      // logical timestamps; a plain long declared TIMESTAMP reads as
      // micros (BigQuery's Avro convention)
      case (TimestampType, l: java.lang.Long) =>
        val micros = Option(fs.getLogicalType).map(_.getName) match {
          case Some("timestamp-micros") | None => l.longValue()
          case Some("timestamp-millis") => Math.multiplyExact(l.longValue(), 1000L)
          case Some(_) => fail()
        }
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
          micros, java.time.temporal.ChronoUnit.MICROS))
      case _ => fail()
    }
  }
}

/** `source_format` dispatcher — the reference's
  * `getattr(bigquery.SourceFormat, source_format)` (`utils/operators.py:57`)
  * over the formats this engine supports. CSV-only options are accepted and
  * applied only for CSV, exactly like the reference (`operators.py:64-68`).
  */
object Ingest {

  import CsvIngest.{ColumnSpec, schemaOf}

  def load(spark: SparkSession, path: String, cols: Seq[ColumnSpec],
           sourceFormat: String = "CSV",
           delimiter: String = ",", skipLeadingRows: Int = 1,
           maxBadRecords: Int = 0, allowJaggedRows: Boolean = false,
           allowQuotedNewlines: Boolean = false,
           ignoreUnknownValues: Boolean = false,
           ingestionDate: String): Loaded = sourceFormat match {
    case "CSV" =>
      CsvIngest.load(spark, path, cols, delimiter, skipLeadingRows,
        maxBadRecords, allowJaggedRows, allowQuotedNewlines,
        ignoreUnknownValues, ingestionDate)
    case "NEWLINE_DELIMITED_JSON" =>
      JsonIngest.load(spark, path, cols, maxBadRecords, ignoreUnknownValues,
        ingestionDate)
    case "PARQUET" =>
      // Parquet is self-describing: the scan enforces declared types
      // (schema projection fails on an incompatible file); corrupt-row
      // counting does not apply — n_bad is structurally 0, like BigQuery
      // parquet loads which fail the whole job on schema mismatch.
      val obs = Observation()
      val out = spark.read.schema(schemaOf(cols)).parquet(path)
        .observe(obs, count(when(lit(false), 1)).as("n_bad"),
          count(lit(1)).as("n_rows"))
        .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
        .withColumn("ingestion_timestamp",
          lit(s"$ingestionDate 00:00:00").cast("timestamp"))
      new Loaded(out, obs, "PARQUET", path, maxBadRecords)
    case "AVRO" =>
      AvroIngest.load(spark, path, cols, maxBadRecords, ingestionDate)
    case "ORC" =>
      // ORC is self-describing like parquet (BigQuery likewise accepts
      // `source_format=ORC` with whole-job schema enforcement): the scan
      // projects the declared schema and fails on an incompatible file;
      // n_bad is structurally 0.
      val obs = Observation()
      val out = spark.read.schema(schemaOf(cols)).orc(path)
        .observe(obs, count(when(lit(false), 1)).as("n_bad"),
          count(lit(1)).as("n_rows"))
        .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
        .withColumn("ingestion_timestamp",
          lit(s"$ingestionDate 00:00:00").cast("timestamp"))
      new Loaded(out, obs, "ORC", path, maxBadRecords)
    case other => throw new IllegalArgumentException(
      s"unknown source_format '$other' (supported: CSV, " +
        "NEWLINE_DELIMITED_JSON, PARQUET, AVRO, ORC)")
  }
}

/** A lazily-loaded ingest batch. `df` is the clean, stamped output; the
  * corrupt-row count rides the first action on it (one scan total).
  * [[writeRaw]] stages the write and publishes only after the bad-record
  * limit passes, so raw-layer readers never observe a failed load.
  *
  * Metric caveat: read metrics after a plain action (count, write). An
  * action whose plan re-executes the scan subtree — e.g. a global sort,
  * where AQE's range-partitioner sample is a second pass — accumulates the
  * observe counters once per pass and inflates the counts.
  */
final class Loaded private[sources](val df: DataFrame, obs: Observation,
                                    kind: String, path: String,
                                    maxBadRecords: Int) {
  private def metric(name: String): Long = {
    // Bounded wait: the metrics listener is async, so a short lag after an
    // action is normal (and on a busy driver can exceed seconds) — but
    // Observation.get blocks FOREVER when no action ever ran. Poll
    // generously, overridable for hostile schedulers, then fail with a
    // usable message.
    import org.apache.spark.sql.graft.Bridge.observedMetrics
    val maxWait = sys.props.get("graft.ingest.metricsWaitMs").map(_.toLong)
      .getOrElse(30000L)
    var waited = 0L
    while (observedMetrics(obs).isEmpty && waited < maxWait) {
      Thread.sleep(50); waited += 50
    }
    val m = observedMetrics(obs)
    if (m.isEmpty) throw new IllegalStateException(
      s"$kind load of $path: no action has completed on df — run one " +
        "(or use writeRaw) before reading load metrics")
    m(name).asInstanceOf[Long]
  }

  /** Corrupt/intolerable row count — call after an action on `df`. */
  def badRecords: Long = metric("n_bad")

  /** Rows scanned (kept + dropped). */
  def rowsScanned: Long = metric("n_rows")

  /** Enforce `maxBadRecords` (reference semantics) — call after an
    * action; returns the bad count when within the limit. */
  def enforceBadLimit(): Long = {
    val bad = badRecords
    if (bad > maxBadRecords)
      throw new IllegalStateException(
        s"$kind load of $path: $bad corrupt records > maxBadRecords=$maxBadRecords")
    bad
  }

  /** Write to the raw layer and enforce the bad-record limit on the same
    * single scan. The batch lands under a hidden `_staging_` prefix first
    * (invisible to partition discovery); partitions move into place only
    * after the limit passes, and the staging dir is removed on failure —
    * so out-of-band readers of the raw path never consume a failed load's
    * output, matching BigQuery's atomic load-job abort. (Per-partition
    * rename is atomic on HDFS/POSIX; on object stores it degrades to
    * copy+delete — still publish-after-validate, just not instantaneous.)
    *
    * @param createDisposition reference `create_disposition`
    *   (`utils/operators.py:22`): CREATE_IF_NEEDED creates the target
    *   directory; CREATE_NEVER fails fast when it does not already exist.
    * @param statsIndexPath when set, the publish refreshes the index for
    *   exactly the partitions it just published via
    *   [[StatsIndex.replacePartitions]] — one `listStatus` per published
    *   partition instead of a table walk, and stale rows from a replaced
    *   partition are dropped (re-ingesting a date must never leave the
    *   index naming trashed files).
    * @param bloomsPath when set (with `bloomColumns`), the publish also
    *   reconciles a per-file Bloom membership index via
    *   [[StatsIndex.reconcileBlooms]] — built on first publish, then
    *   incrementally updated (only unseen files scanned, rows for
    *   replaced files dropped), so point-lookup consumers
    *   ([[StatsIndex.prunedReadPoint]], `Upsert.mergeInto`'s key-split)
    *   never see an index that lags the table.
    * @return the bad-record count.
    */
  def writeRaw(outPath: String,
               createDisposition: String = "CREATE_IF_NEEDED",
               statsIndexPath: Option[String] = None,
               statsColumns: Seq[String] = Nil,
               bloomsPath: Option[String] = None,
               bloomColumns: Seq[String] = Nil,
               bloomItemsPerFile: Long = 1L << 20,
               bloomFpp: Double = 0.01): Long = {
    // validate the bloom surface BEFORE any data moves: discovering the
    // missing column list inside reconcileBlooms would surface a plain
    // usage error only after a partial publish (bloom index left lagging)
    require(bloomsPath.isEmpty || bloomColumns.nonEmpty,
      "writeRaw: bloomsPath set but bloomColumns empty — name the " +
        "equality-probe columns to index")
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val dest = new org.apache.hadoop.fs.Path(outPath)
    val fs = dest.getFileSystem(hconf)
    createDisposition match {
      case "CREATE_IF_NEEDED" => ()
      case "CREATE_NEVER" =>
        if (!fs.exists(dest)) throw new IllegalStateException(
          s"$kind load of $path: create_disposition=CREATE_NEVER and raw " +
            s"target $outPath does not exist")
      case other => throw new IllegalArgumentException(
        s"unknown create_disposition '$other'")
    }
    val staging = new org.apache.hadoop.fs.Path(dest,
      s"_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").partitionBy("ingestion_date")
      .parquet(staging.toString)
    val bad =
      try enforceBadLimit()
      catch { case e: Throwable => fs.delete(staging, true); throw e }
    val published = RawLayer.publishPartitions(fs, staging, dest)
    statsIndexPath.foreach { idx =>
      // replacePartitions, not append-only updateFiles: publishPartitions
      // REPLACES an existing partition dir wholesale (new random part-file
      // names, old files trashed), so a same-date re-ingest would leave
      // stale index rows naming deleted files — and this index is used AS
      // the file listing (partitionFiles / prunedRead / index-fed
      // mergeInto), where a stale row is a PATH_NOT_FOUND at read time.
      StatsIndex.replacePartitions(spark, idx,
        published.map(_.toString), statsColumns)
    }
    bloomsPath.foreach { bp =>
      // full reconcile (not an append): a same-date re-ingest REPLACES its
      // partition's files, so the old files' bloom rows must drop — the
      // same staleness rule replacePartitions enforces for the stats index
      StatsIndex.reconcileBlooms(spark, outPath, bp, bloomColumns,
        bloomItemsPerFile, bloomFpp)
    }
    bad
  }
}

