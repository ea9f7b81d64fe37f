package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.CsvIngest.ColumnSpec

/** File-based domain onboarding — the reference's YAML config contract
  * (`config/sales_config.yaml`, loaded by `utils/sql_utils.py:100`
  * `get_table_config`), so a new domain is a config file, not a recompile.
  *
  * A `tables:` entry with a `schema:` is a raw CSV ingest; entries typed
  * `dimension`/`fact` become `core.<name>` transform nodes and `datamart`
  * entries `datamart.<name>` nodes. Transform BODIES stay code (the
  * reference keeps them as per-table SQL files; here they're DataFrame
  * builders) — the file contributes the graph: which tables exist, their
  * schemas, and their `dependencies:` edges, resolved against a build
  * registry at [[toDomain]] time.
  */
object DomainConfigFile {

  /** Typed view of one `tables:` entry (reference `get_table_config`). */
  final case class TableEntry(
      name: String,
      kind: String, // "raw" | "dimension" | "fact" | "datamart"
      schema: Seq[ColumnSpec],
      sourcePath: Option[String],
      sourceTable: Option[String],
      scdType: Option[Int],
      primaryKey: Option[String],
      dependencies: Seq[String],
      maxBadRecords: Int,
      sourceType: Option[String] = None,
      sourceFormat: Option[String] = None)

  final case class DomainFile(domain: String, tables: Seq[TableEntry],
                              config: Yaml.YMap) {
    /** Reference `get_table_config(domain, table_name)` semantics,
      * including the error on an unknown table. */
    def tableConfig(name: String): TableEntry =
      tables.find(_.name == name).getOrElse(
        throw new NoSuchElementException(s"Table $name not found in config"))
  }

  /** JSON configs parse through Spark's bundled jackson into the same node
    * model the YAML parser produces — one downstream path for both. */
  private def fromJson(text: String): Yaml.YMap = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    // JSON null == key absent (matching a YAML file where the key is
    // omitted), so downstream optional-field handling sees one shape for
    // both formats instead of a "" that later dies as a bare
    // NumberFormatException in an int field. A null ELEMENT has no
    // absent-key reading — reject it with the path to fix.
    def conv(n: JsonNode): Yaml.Node =
      if (n.isObject)
        Yaml.YMap(n.properties().asScala.toVector
          .filterNot(_.getValue.isNull)
          .map(e => e.getKey -> conv(e.getValue)))
      else if (n.isArray) {
        val elems = n.elements().asScala.toVector
        require(!elems.exists(_.isNull),
          "config: null array element — drop it or use an empty string")
        Yaml.YSeq(elems.map(conv))
      }
      else Yaml.YStr(n.asText())
    val mapper = new ObjectMapper()
    // match the YAML parser's duplicate-key rejection — Jackson otherwise
    // keeps the LAST duplicate silently, diverging the two formats
    mapper.enable(com.fasterxml.jackson.core.JsonParser.Feature.STRICT_DUPLICATE_DETECTION)
    conv(mapper.readTree(text)) match {
      case m: Yaml.YMap => m
      case other => throw new IllegalArgumentException(
        s"config: top level must be an object, got $other")
    }
  }

  /** Parse `<domain>_config.yaml` / `.yml` / `.json` (domain derived from
    * the filename, like the reference's `config/{domain}_config.yaml`
    * convention). */
  def load(path: Path): DomainFile = {
    val text = Files.readString(path)
    val cfg =
      if (path.getFileName.toString.endsWith(".json")) fromJson(text)
      else Yaml.parse(text)
    val domain = path.getFileName.toString
      .stripSuffix(".yaml").stripSuffix(".yml").stripSuffix(".json")
      .stripSuffix("_config")
    val tables = cfg.map("tables").map(_.fields).getOrElse(Vector.empty).map {
      case (name, m: Yaml.YMap) => tableEntry(name, m)
      case (name, other) =>
        throw new IllegalArgumentException(s"table $name: expected a map, got $other")
    }
    DomainFile(domain, tables, cfg)
  }

  private def tableEntry(name: String, m: Yaml.YMap): TableEntry = {
    val schema = m.seq("schema").map {
      case col: Yaml.YMap => ColumnSpec(
        col.str("name").getOrElse(
          throw new IllegalArgumentException(s"table $name: schema column without a name")),
        col.str("type").getOrElse("STRING"))
      case other =>
        throw new IllegalArgumentException(s"table $name: bad schema entry $other")
    }
    TableEntry(
      name = name,
      kind = m.str("type").getOrElse(if (schema.nonEmpty) "raw" else "datamart"),
      schema = schema,
      sourcePath = m.map("source").flatMap(_.str("path")),
      sourceTable = m.str("source_table"),
      scdType = m.int("scd_type"),
      primaryKey = m.str("primary_key"),
      dependencies = m.seq("dependencies").collect { case Yaml.YStr(d) => d },
      maxBadRecords = m.int("max_bad_records").getOrElse(0),
      sourceType = m.map("source").flatMap(_.str("type")),
      sourceFormat = m.map("source").flatMap(_.str("format")))
  }

  /** Reference dep strings (`raw.sales.customers`, `core.dim.dim_customers`,
    * `core.fact.fact_orders`) → graft task ids (`raw.customers`,
    * `core.dim_customers`, …). */
  def taskId(dep: String): String = dep.split('.') match {
    case Array("raw", _, table) => s"raw.$table"
    case Array("core", _, table) => s"core.$table"
    case Array(layer, table) => s"$layer.$table"
    case Array(table) => table
    case _ => throw new IllegalArgumentException(s"unmappable dependency '$dep'")
  }

  private def nodeId(t: TableEntry): String = t.kind match {
    case "raw" => s"raw.${t.name}"
    case "dimension" | "fact" => s"core.${t.name}"
    case "datamart" => s"datamart.${t.name}"
    case other => throw new IllegalArgumentException(
      s"table ${t.name}: unknown type '$other'")
  }

  /** Assemble the runnable [[DomainConfig.Domain]]: raw entries become
    * CSV-ingest tasks; transform entries resolve their builder from
    * `builds` by task id, falling back to a SQL file in the reference's
    * `sql/<layer>/...` layout under `sqlDir` (with `{{key}}` params) when
    * one exists. Fails fast on a transform with neither — a config that
    * names a table nobody implemented is an onboarding error, not a
    * runtime surprise. */
  def toDomain(file: DomainFile,
               builds: Map[String, SparkSession => DataFrame],
               sqlDir: Option[Path] = None,
               sqlParams: Map[String, String] = Map.empty): DomainConfig.Domain = {
    // Reject ambiguous entries up front: a transform-typed table with a
    // schema would otherwise silently become a raw ingest (and its
    // transform node would never exist); a raw table without a schema
    // would only fail at task runtime.
    file.tables.foreach { t =>
      if (t.kind != "raw" && t.schema.nonEmpty) throw new IllegalArgumentException(
        s"table ${t.name}: type '${t.kind}' must not declare a schema " +
          "(schemas belong to raw CSV tables)")
      if (t.kind == "raw" && t.schema.isEmpty) throw new IllegalArgumentException(
        s"table ${t.name}: raw table without a schema")
    }
    // Per-table `source.format` wins; otherwise the corpus-level default
    // `sources.<type>.file_format` (reference sales_config.yaml:16); CSV
    // when neither speaks.
    def formatOf(t: TableEntry): String =
      t.sourceFormat
        .orElse(for {
          srcType <- t.sourceType
          sources <- file.config.map("sources")
          src <- sources.map(srcType)
          fmt <- src.str("file_format")
        } yield fmt)
        .getOrElse("CSV")
    val raw = file.tables.filter(_.kind == "raw").map { t =>
      DomainConfig.RawTable(t.name, t.schema, t.maxBadRecords, formatOf(t))
    }
    val transforms = file.tables.filter(_.kind != "raw").map { t =>
      val id = nodeId(t)
      val sqlFile = sqlDir.map(SqlTransforms.sqlPathFor(_, file.domain, t))
        .filter(Files.exists(_))
      val build = builds.get(id)
        .orElse(sqlFile.map(SqlTransforms.sqlBuild(_, sqlParams)))
        .getOrElse(throw new IllegalArgumentException(
          s"no builder registered and no SQL file for transform '$id' " +
            s"(registry: ${builds.keys.toSeq.sorted.mkString(", ")}; " +
            s"looked for: ${sqlDir.map(SqlTransforms.sqlPathFor(_, file.domain, t)).getOrElse("-")})"))
      DomainConfig.Transform(id, t.dependencies.map(taskId))(build)
    }
    DomainConfig.Domain(file.domain, raw, transforms)
  }

  /** One-call onboarding: file + builder registry → runnable domain. */
  def loadDomain(path: Path,
                 builds: Map[String, SparkSession => DataFrame]): DomainConfig.Domain =
    toDomain(load(path), builds)
}
