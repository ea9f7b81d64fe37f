package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-file-driven transforms — the reference's workflow where each
  * core/datamart table is a SQL file under `sql/<layer>/...` with
  * `{{key}}` placeholders (`utils/sql_utils.py`: `get_sql_path`,
  * `read_sql_file`). A reference user can drop their files into the same
  * layout and run them as Spark SQL; transform bodies then live beside the
  * config instead of in Scala.
  */
object SqlTransforms {

  /** Reference `get_sql_path` layout:
    * raw → `sql/raw[/domain]/<table>.sql`;
    * core → `sql/core[/dim|/fact]/<table>.sql`;
    * datamart → `sql/datamart[/domain]/<table>.sql`. */
  def sqlPath(base: Path, layer: String, sub: Option[String], table: String): Path = {
    val dir = layer.toLowerCase match {
      case "raw" | "core" | "datamart" =>
        sub.foldLeft(base.resolve(layer.toLowerCase))(_ resolve _)
      case other => throw new IllegalArgumentException(s"Unknown layer: $other")
    }
    dir.resolve(s"$table.sql")
  }

  /** Reference `read_sql_file`: literal `{{key}}` → value. */
  def readSqlFile(path: Path, params: Map[String, String]): String =
    params.foldLeft(Files.readString(path)) { case (q, (k, v)) =>
      q.replace(s"{{$k}}", v)
    }

  /** Builder running a substituted SQL file (for the transform registry /
    * [[DomainConfigFile.toDomain]]). Substitution happens at RUN time, so
    * params may include per-run values the caller closes over. */
  def sqlBuild(path: Path, params: => Map[String, String]): SparkSession => DataFrame =
    s => s.sql(readSqlFile(path, params))

  /** Resolve a config-file table entry to its SQL file in the reference
    * layout (dimension → core/dim, fact → core/fact, datamart →
    * datamart/<domain>). */
  def sqlPathFor(base: Path, domain: String,
                 t: DomainConfigFile.TableEntry): Path = t.kind match {
    case "dimension" => sqlPath(base, "core", Some("dim"), t.name)
    case "fact" => sqlPath(base, "core", Some("fact"), t.name)
    case "datamart" => sqlPath(base, "datamart", Some(domain), t.name)
    case other => throw new IllegalArgumentException(
      s"table ${t.name}: no SQL layout for type '$other'")
  }
}
