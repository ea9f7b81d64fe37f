package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned parquet tables.
  *
  * At 100 TB the silent killer is not data volume but FILE COUNT: a
  * streaming sink or a fine-grained MERGE leaves thousands of KB-sized
  * files per partition, and every downstream scan pays listing + open +
  * footer-parse per file (object-store listings are the worst case).
  * Compaction rewrites only the partitions whose layout is bad, into
  * `ceil(bytes / targetBytes)` files each — the Delta/Iceberg `OPTIMIZE`
  * idea re-expressed on plain parquet directories.
  *
  * Scale decisions:
  *  - census is a DRIVER-SIDE listing (bounded by file count, the same
  *    metadata a scan would list anyway) — no Spark job runs for the plan;
  *  - the rewrite reads each bad partition and `coalesce`s — NO shuffle,
  *    tasks just concatenate small files into big ones (bin-packing, not
  *    re-hashing; the bytes move once);
  *  - partitions already at-or-under their target file count are never
  *    read, never written — their files stay byte-identical;
  *  - the rewrite lands under a hidden `_staging_*` prefix and moves into
  *    place per-partition via [[graft.sources.RawLayer]]'s publish
  *    machinery (rename-atomic on HDFS/POSIX): a crash before publish
  *    leaves the table untouched, and publish renames each old partition
  *    ASIDE into a hidden `_trash_*` dir before renaming the new one in —
  *    no crash point destroys data (worst case: one partition momentarily
  *    absent from discovery, its old files recoverable from trash);
  *  - re-running is a no-op (the plan comes out empty once layout is good).
  */
object Compaction {

  /** One partition's layout census + target. `compact` = the rewrite
    * predicate: more files than the byte-derived target (and at least
    * `minFiles`, so a 2-file partition isn't churned for nothing). */
  case class PartitionPlan(partition: String, nFiles: Int, bytes: Long,
                           targetFiles: Int, compact: Boolean)

  case class Report(partitionsCompacted: Int, filesBefore: Int, filesAfter: Int,
                    bytesRewritten: Long)

  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Census every `col=value` partition directory under `path` (driver-side
    * listing only — no job). */
  def plan(spark: SparkSession, path: String, targetBytes: Long,
           minFiles: Int = 4): Seq[PartitionPlan] = {
    require(targetBytes >= 1, s"targetBytes=$targetBytes must be >= 1")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .sortBy(_.getPath.getName)
      .map { st =>
        val files = dataFiles(fs, st.getPath)
        val bytes = files.map(_.getLen).sum
        val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        PartitionPlan(st.getPath.getName, files.length, bytes, target,
          compact = files.length > target && files.length >= minFiles)
      }.toSeq
  }

  /** Rewrite exactly the partitions [[plan]] flags, staged-atomic.
    *
    * @param zorderBy when non-empty, the rewrite Z-orders each compacted
    *   partition on these columns ([[ZOrder]]) instead of plain
    *   bin-packing — compaction is the moment a deployment applies layout
    *   optimization, since the bytes are being rewritten anyway. The
    *   price is one range exchange per partition (coalesce moves bytes
    *   once, clustering must also re-order them); the payoff is tight
    *   per-file min-max stats on every listed column for all later scans.
    *   Good partitions still skip the rewrite entirely, so repeated runs
    *   converge to a no-op either way. */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
              minFiles: Int = 4, zorderBy: Seq[String] = Nil): Report = {
    val todo = plan(spark, path, targetBytes, minFiles).filter(_.compact)
    if (todo.isEmpty) return Report(0, 0, 0, 0L)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(root,
      s"_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      todo.foreach { p =>
        val df = spark.read.parquet(s"$path/${p.partition}")
        val out =
          if (zorderBy.isEmpty) df.coalesce(p.targetFiles)
          else ZOrder.clustered(df, zorderBy, p.targetFiles)
        out.write.mode("overwrite").parquet(s"$staging/${p.partition}")
      }
      graft.sources.RawLayer.publishPartitions(fs, staging, root)
    } catch {
      case e: Throwable =>
        fs.delete(staging, true)
        throw e
    }
    val after = todo.map(p =>
      dataFiles(fs, new Path(root, p.partition)).length).sum
    Report(todo.size, todo.map(_.nFiles).sum, after, todo.map(_.bytes).sum)
  }
}
