package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.ChangeFeed
import graft.sources.StatsIndex

/** Continuous change-data-feed delivery for a VERSIONED table
  * ([[graft.operators.Upsert.mergeIntoVersioned]]): follow the index
  * generations as they commit and deliver each hop's change rows
  * ([[ChangeFeed.between]] — keyed insert/update/delete with
  * before/after values) downstream exactly once.
  *
  * The generation manifest IS the changelog — no extra write-path
  * bookkeeping, no log-shipping: a hop between two committed
  * generations is immutable and recomputable forever (until vacuum
  * retention), so delivery needs only a CURSOR — the last generation
  * whose hop has been handed off — persisted as a tiny file and
  * advanced after each handler returns. Crash between handler and
  * cursor advance ⇒ the hop re-delivers (at-least-once); [[drainTo]]
  * lands each hop under its `_from_gen=N` partition with dynamic
  * overwrite (the [[StreamSink]] discipline keyed by generation instead
  * of batch id), so a replay rewrites exactly its own partition and the
  * OUTPUT is exactly-once.
  *
  * Deployment shape: run [[drain]]/[[drainTo]] on a schedule or from a
  * post-merge hook. Each call costs ∝ the changed slices of the new
  * hops (the [[ChangeFeed]] partition-manifest diff), never the table. */
object ChangeFeedStream {

  /** The delivered-through generation, if a cursor has been written. */
  def readCursor(spark: SparkSession, cursorPath: String): Option[Long] = {
    val p = new Path(cursorPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      scala.util.Try(
        new String(buf, java.nio.charset.StandardCharsets.UTF_8)
          .trim.toLong).toOption
    }
  }

  private def writeCursor(spark: SparkSession, cursorPath: String,
                          gen: Long): Unit = {
    val p = new Path(cursorPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename-over is the atomic cursor flip (POSIX/HDFS)
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"cursor rename $tmp -> $p failed")
  }

  /** Deliver every hop committed since the cursor, oldest first:
    * `process(fromGen, toGen, changes)` per consecutive complete
    * generation pair, cursor advanced AFTER each handler returns — so a
    * crash mid-drain re-delivers only the unacknowledged hop. A first
    * call with no cursor delivers nothing and registers the LATEST
    * generation (a follower starts from "now"); pass `startAt` to begin
    * from an explicit retained generation instead. Returns the number
    * of hops delivered. */
  def drain(spark: SparkSession, tablePath: String, indexRoot: String,
            keys: Seq[String], partitionCol: String, cursorPath: String,
            startAt: Option[Long] = None)
           (process: (Long, Long, DataFrame) => Unit): Int = {
    val gens = StatsIndex.generations(spark, indexRoot)
    if (gens.isEmpty) return 0
    val cursor = readCursor(spark, cursorPath).orElse(startAt) match {
      case Some(c) =>
        require(gens.contains(c),
          s"changefeed cursor $c names a generation no longer retained " +
            s"under $indexRoot (retained: ${gens.mkString(", ")}) — the " +
            "follower fell behind vacuum retention and hops are LOST; " +
            "reseed with startAt from a retained generation")
        c
      case None =>
        writeCursor(spark, cursorPath, gens.last)
        return 0
    }
    val pending = gens.filter(_ > cursor)
    var from = cursor
    var delivered = 0
    pending.foreach { to =>
      process(from, to, ChangeFeed.between(spark, tablePath, indexRoot,
        from, to, keys, partitionCol))
      writeCursor(spark, cursorPath, to)
      from = to
      delivered += 1
    }
    delivered
  }

  /** [[drain]] landed as parquet: each hop's change rows under
    * `_from_gen=N/` with dynamic partition overwrite — replays rewrite
    * exactly their own partition, so downstream readers see each hop
    * once no matter how many times delivery crashes. */
  def drainTo(spark: SparkSession, tablePath: String, indexRoot: String,
              keys: Seq[String], partitionCol: String, cursorPath: String,
              outPath: String, startAt: Option[Long] = None): Int =
    drain(spark, tablePath, indexRoot, keys, partitionCol, cursorPath,
        startAt) { (from, _, changes) =>
      import org.apache.spark.sql.functions.lit
      changes.withColumn("_from_gen", lit(from))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_from_gen")
        .parquet(outPath)
    }
}
