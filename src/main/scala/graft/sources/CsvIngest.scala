package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven CSV ingestion into the parquet raw layer.
  *
  * Re-expresses the reference's GCSBigQueryOperator
  * (/root/reference/utils/operators.py:11-96): declared schema, write
  * dispositions, header/delimiter handling, bad-record tolerance, and an
  * `ingestion_timestamp` partition column — but Spark-first: the CSV scan is
  * distributed, PERMISSIVE-mode corrupt rows are counted instead of
  * trusted, and the "table" is a date-partitioned parquet directory where
  * idempotent re-loads use dynamic partition overwrite instead of MERGE.
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

  /** Load a CSV batch with a declared schema.
    *
    * @param maxBadRecords fail the load when more rows are corrupt than this
    *                      (reference max_bad_records); corrupt rows are
    *                      dropped otherwise.
    * @param ingestionDate the load's logical date (reference `{{ ds }}`) —
    *                      stamped, not wall-clock, so backfills are
    *                      deterministic and re-runs idempotent.
    */
  def load(spark: SparkSession, path: String, cols: Seq[ColumnSpec],
           delimiter: String = ",", header: Boolean = true,
           maxBadRecords: Int = 0, ingestionDate: String): DataFrame = {
    val schema = schemaOf(cols).add("_corrupt_record", StringType)
    val raw = spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .cache() // corrupt-count + clean pass share one scan
    val bad = raw.where(col("_corrupt_record").isNotNull).count()
    if (bad > maxBadRecords)
      throw new IllegalStateException(
        s"CSV load of $path: $bad corrupt records > maxBadRecords=$maxBadRecords")
    raw.where(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
      .withColumn("ingestion_date", lit(ingestionDate).cast("date"))
      .withColumn("ingestion_timestamp", lit(s"$ingestionDate 00:00:00").cast("timestamp"))
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
