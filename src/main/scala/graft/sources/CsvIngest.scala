package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven CSV ingestion into the parquet raw layer.
  *
  * Re-expresses the reference's GCSBigQueryOperator
  * (/root/reference/utils/operators.py:11-96): declared schema, write
  * dispositions, delimiter/leading-row handling, jagged-row / quoted-newline
  * / unknown-value tolerance, bad-record limits, and an
  * `ingestion_timestamp` partition column — but Spark-first: the CSV scan is
  * distributed, PERMISSIVE-mode corrupt rows are counted via an
  * [[Observation]] on the SAME scan that writes (no cache of the raw input,
  * no second pass — at 100 TB/day a side-count must not cost a
  * materialization), and the "table" is a date-partitioned parquet
  * directory where idempotent re-loads use dynamic partition overwrite
  * instead of MERGE.
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

  /** A lazily-loaded CSV batch. `df` is the clean, stamped output; the
    * corrupt-row count rides the first action on it (one scan total).
    * The bad-record LIMIT is therefore enforced after that action — with
    * partition-grain overwrite the failed run's output is replaced by the
    * re-run, so post-hoc enforcement keeps idempotency (BigQuery aborts the
    * load job instead; same observable contract for the pipeline, the
    * difference is when the partition's bytes exist).
    */
  final class LoadedCsv private[sources](val df: DataFrame, obs: Observation,
                                         path: String, maxBadRecords: Int) {
    private def metric(name: String): Long = {
      // Bounded wait: the metrics listener is async (a short wait after an
      // action is normal), but Observation.get blocks FOREVER when no
      // action ever ran — fail with a usable message instead.
      import org.apache.spark.sql.graft.Bridge.observedMetrics
      var waited = 0L
      while (observedMetrics(obs).isEmpty && waited < 2000) {
        Thread.sleep(50); waited += 50
      }
      val m = observedMetrics(obs)
      if (m.isEmpty) throw new IllegalStateException(
        s"CSV load of $path: no action has completed on df — run one " +
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
          s"CSV load of $path: $bad corrupt records > maxBadRecords=$maxBadRecords")
      bad
    }

    /** Write to the raw layer and enforce the bad-record limit on the same
      * single scan. Returns the bad count. */
    def writeRaw(outPath: String): Long = {
      RawLayer.appendPartitioned(df, outPath)
      enforceBadLimit()
    }
  }

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
           ingestionDate: String): LoadedCsv = {
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
      max(length(concat_ws("", cols.map(c => col(c.name).cast("string")): _*)))
        .as("_pin"))
    val out = observed
      .where(keep)
      .drop("_corrupt_record")
      .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
      .withColumn("ingestion_timestamp", lit(s"$ingestionDate 00:00:00").cast("timestamp"))
    new LoadedCsv(out, obs, path, maxBadRecords)
  }
}

/** Raw-layer parquet writes: the reference's write dispositions on
  * partitioned immutable storage.
  */
object RawLayer {

  /** WRITE_APPEND with backfill idempotency: dynamic partition overwrite
    * replaces exactly the partitions present in this batch — re-running a
    * day never duplicates it (reference gets this from MERGE; we get it
    * from partition-grain overwrite, which at 100 TB is also the only
    * affordable variant).
    */
  def appendPartitioned(df: DataFrame, outPath: String,
                        partitionCol: String = "ingestion_date"): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(outPath)
  }

  /** WRITE_TRUNCATE: full refresh (datamart layer). */
  def truncateWrite(df: DataFrame, outPath: String): Unit =
    df.write.mode("overwrite").parquet(outPath)
}
