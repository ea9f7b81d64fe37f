package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path => HPath}

import graft.SparkSpec

/** The trash-aside half of the staged-atomic publish
  * ([[RawLayer.publishPartitions]]): replaced partitions are renamed ASIDE
  * into a hidden `_trash_*` dir (never delete-then-rename), the trash is
  * invisible to readers mid-publish, dropped after success, rolled back in
  * place on a live in-rename failure, and orphans from crashed runs are
  * swept once past retention.
  */
class PublishTrashSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()
  private def hp(s: String) = new HPath(s)
  private def fsOf(s: String): FileSystem = hp(s).getFileSystem(hconf)

  private def writePart(dir: String, day: String, amount: Double): Unit =
    Seq((1L, amount)).toDF("id", "amount").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/day=$day")

  private def amounts(dest: String): Seq[Double] =
    spark.read.parquet(dest).select("amount").as[Double].collect().toSeq.sorted

  private def topNames(dest: String): Seq[String] =
    fsOf(dest).listStatus(hp(dest)).map(_.getPath.getName).toSeq

  test("successful publish replaces the partition and leaves no _trash_/_staging_") {
    val root = Files.createTempDirectory("graft-pub").toString
    val dest = s"$root/t"; val staging = s"$dest/_staging_test"
    writePart(dest, "2024-01-01", 1.0)
    writePart(staging, "2024-01-01", 2.0)
    RawLayer.publishPartitions(fsOf(dest), hp(staging), hp(dest))
    assert(amounts(dest) == Seq(2.0), "replaced partition should carry the new data")
    assert(!topNames(dest).exists(n => n.startsWith("_trash_") || n.startsWith("_staging_")),
      s"publish machinery leaked into dest: ${topNames(dest)}")
  }

  test("mid-publish trash state: old data aside, invisible to reads, recoverable") {
    // reproduce the worst crash window's on-disk state by hand: the old
    // partition renamed aside, the new one not yet renamed in
    val root = Files.createTempDirectory("graft-pub2").toString
    val dest = s"$root/t"
    writePart(dest, "2024-01-01", 1.0)
    writePart(dest, "2024-01-02", 5.0)
    val fs = fsOf(dest)
    fs.mkdirs(hp(s"$dest/_trash_dead"))
    assert(fs.rename(hp(s"$dest/day=2024-01-01"), hp(s"$dest/_trash_dead/day=2024-01-01")))
    // discovery must not surface the trashed partition...
    assert(amounts(dest) == Seq(5.0))
    // ...but its bytes survive for recovery
    assert(fs.exists(hp(s"$dest/_trash_dead/day=2024-01-01")))
    assert(spark.read.parquet(s"$dest/_trash_dead/day=2024-01-01")
      .select("amount").as[Double].head() == 1.0)
  }

  test("live in-rename failure rolls the displaced partition back in place") {
    val root = Files.createTempDirectory("graft-pub3").toString
    val dest = s"$root/t"; val staging = s"$dest/_staging_test"
    writePart(dest, "2024-01-01", 1.0)
    writePart(staging, "2024-01-01", 2.0)
    val failing = new FilterFileSystem(fsOf(dest)) {
      // fail exactly the in-rename (src in staging), not the aside-rename
      // (src in dest) or the rollback (src in trash)
      override def rename(src: HPath, dst: HPath): Boolean =
        if (src.toString.contains("_staging_") && dst.getName == "day=2024-01-01") false
        else super.rename(src, dst)
    }
    val e = intercept[java.io.IOException] {
      RawLayer.publishPartitions(failing, hp(staging), hp(dest))
    }
    assert(e.getMessage.contains("previous partition restored in place"), e.getMessage)
    // availability unchanged: the OLD data is back at the target path
    assert(amounts(dest) == Seq(1.0),
      "after a live rename failure the old partition must be restored")
  }

  test("orphan _trash_/_staging_ dirs are swept once past retention, fresh ones kept") {
    val root = Files.createTempDirectory("graft-pub4").toString
    val dest = s"$root/t"; val staging = s"$dest/_staging_test"
    writePart(dest, "2024-01-01", 1.0)
    writePart(staging, "2024-01-02", 2.0)
    val fs = fsOf(dest)
    fs.mkdirs(hp(s"$dest/_trash_old")); fs.mkdirs(hp(s"$dest/_staging_old"))
    fs.mkdirs(hp(s"$dest/_trash_fresh"))
    val stale = System.currentTimeMillis() - RawLayer.OrphanRetentionMs - 3600 * 1000
    assert(new java.io.File(s"$dest/_trash_old").setLastModified(stale))
    assert(new java.io.File(s"$dest/_staging_old").setLastModified(stale))
    RawLayer.publishPartitions(fs, hp(staging), hp(dest))
    val names = topNames(dest)
    assert(!names.contains("_trash_old"), "stale trash not swept")
    assert(!names.contains("_staging_old"), "stale staging not swept")
    assert(names.contains("_trash_fresh"), "fresh (possibly live) trash must survive the sweep")
  }
}
