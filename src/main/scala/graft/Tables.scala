package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated star-schema test tables.
  *
  * Mirrors the reference's config-driven table registry with declared schemas
  * (/root/reference/config/sales_config.yaml, /root/reference/utils/operators.py:11-96):
  * every table has a declared column->type contract, `load` validates the
  * on-disk parquet against it, and documented coercions are applied centrally
  * here rather than at call sites. Schema drift in the driver's generated
  * testdata (it has already shipped two encodings of `events.ts` across
  * rounds: INT64 TIMESTAMP(NANOS) and timestamp[us]) therefore fails as ONE
  * named `testdata schema drift` error at load, instead of N scattered
  * analysis errors deep inside queries.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns may arrive as µs TIMESTAMP with or without the
    * isAdjustedToUTC bit (Spark 4 reads the latter as TIMESTAMP_NTZ when
    * `spark.sql.parquet.inferTimestampNTZ.enabled` is on, the default). */
  private val tsEnc: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val floatArr: Set[DataType] =
    Set(ArrayType(FloatType, containsNull = true), ArrayType(FloatType, containsNull = false))

  /** Declared schema registry: accepted on-disk encodings per column. */
  val declared: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> tsEnc, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> tsEnc),
    "events" -> Seq(
      "event_id" -> Set(LongType), "ts" -> (tsEnc + LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType), "embedding" -> floatArr,
      "label" -> Set(IntegerType)))

  /** Load a table, validate it against [[declared]], and apply the documented
    * coercions (currently: `events.ts` normalized to session-zone µs
    * TimestampType whatever the on-disk encoding).
    *
    * DELIBERATE session-conf set (the exception to the per-write-option rule
    * enforced on RawLayer/StreamSink): `nanosAsLong` is a READ-side flag with
    * no per-scan option form, it is set-once to a constant (never toggled
    * back, so there is no order-dependence to leak), and its only effect is
    * enabling a ns-timestamp scan that would otherwise throw at schema
    * conversion — with a µs-encoded file the flag is a no-op.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    validate(name, raw)
    coerce(name, raw)
  }

  /** Throw one clearly-named error on testdata schema drift. */
  private def validate(name: String, df: DataFrame): Unit =
    declared.get(name).foreach { cols =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
      cols.foreach { case (c, accepted) =>
        actual.get(c) match {
          case None =>
            sys.error(s"testdata schema drift: table '$name' is missing declared column '$c' " +
              s"(found columns: ${df.schema.fieldNames.mkString(", ")})")
          case Some(dt) if !accepted.contains(dt) =>
            sys.error(s"testdata schema drift: table '$name' column '$c' has type " +
              s"${dt.catalogString}, accepted encodings: " +
              accepted.map(_.catalogString).mkString(", "))
          case _ => ()
        }
      }
    }

  /** Documented coercions, applied schema-adaptively:
    *  - events.ts as INT64 (legacy ns via nanosAsLong) -> ns div 1000 -> µs TimestampType
    *  - events.ts as TIMESTAMP_NTZ -> cast to TimestampType (UTC session zone,
    *    value-preserving — every entrypoint pins spark.sql.session.timeZone=UTC)
    *  - events.ts already TimestampType -> untouched
    */
  private def coerce(name: String, df: DataFrame): DataFrame =
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }

  /** Register all tables as temp views (used by tests and the DAG demo). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
