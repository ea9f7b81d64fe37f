package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.CsvIngest.ColumnSpec
import graft.sources.{Ingest, RawLayer}

/** Config-driven pipeline onboarding — the reference's
  * `config/sales_config.yaml` + the per-table loops in its DAG scripts, as a
  * typed Scala model. Adding a domain = declaring one [[DomainConfig]]
  * value; [[PipelineBuilder]] expands it into raw-ingest tasks and wires
  * the transform layers behind them, exactly like the reference's three
  * DAGs but in one dependency graph.
  */
object DomainConfig {

  /** A raw table fed from date-partitioned file drops
    * (`<inbox>/<table>/<date>/<table>_<date>.<ext>` — the reference's GCS
    * layout, README "GCS File Structure"). `sourceFormat` mirrors the
    * loader's `source_format` (CSV / NEWLINE_DELIMITED_JSON / PARQUET /
    * AVRO / ORC) and picks the inbox extension. */
  final case class RawTable(name: String, schema: Seq[ColumnSpec],
                            maxBadRecords: Int = 0,
                            sourceFormat: String = "CSV") {
    def extension: String = sourceFormat match {
      case "NEWLINE_DELIMITED_JSON" => "json"
      case "PARQUET" => "parquet"
      case "AVRO" => "avro"
      case "ORC" => "orc"
      case _ => "csv"
    }
  }

  /** A transform layer node: reads whatever it needs via the session,
    * writes one output table; deps name other nodes. */
  final case class Transform(name: String, deps: Seq[String])
                            (val build: SparkSession => DataFrame)

  final case class Domain(name: String, raw: Seq[RawTable],
                          transforms: Seq[Transform])
}

object PipelineBuilder {
  import DomainConfig._

  /** Expand a domain config into DAG tasks for one logical date.
    *
    * @param inbox  incoming CSV root (the reference's GCS bucket)
    * @param warehouse parquet warehouse root (raw/ + layers)
    */
  def tasks(spark: SparkSession, domain: Domain, inbox: String,
            warehouse: String, ds: String): Seq[Dag.Task] = {
    val dsNodash = ds.replace("-", "")
    val ingest = domain.raw.map { rt =>
      Dag.Task(s"raw.${rt.name}")(() => {
        val path = s"$inbox/${rt.name}/$dsNodash/${rt.name}_$dsNodash.${rt.extension}"
        Ingest.load(spark, path, rt.schema, sourceFormat = rt.sourceFormat,
            maxBadRecords = rt.maxBadRecords, ingestionDate = ds)
          .writeRaw(s"$warehouse/raw/${rt.name}")
        ()
      })
    }
    val rawNames = domain.raw.map(rt => s"raw.${rt.name}")
    val transforms = domain.transforms.map { tr =>
      // a transform with no explicit deps waits for all raw ingests
      val deps = if (tr.deps.nonEmpty) tr.deps else rawNames
      Dag.Task(tr.name, deps = deps)(() =>
        RawLayer.truncateWrite(tr.build(spark), s"$warehouse/${tr.name.replace('.', '/')}"))
    }
    ingest ++ transforms
  }

  /** Backfill a domain over logical dates (reference `{{ ds }}` semantics). */
  def backfill(spark: SparkSession, domain: Domain, inbox: String,
               warehouse: String, dates: Seq[String]): Map[String, Dag.Report] =
    Dag.backfill(dates)(ds => tasks(spark, domain, inbox, warehouse, ds))
}
