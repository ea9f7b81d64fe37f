package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-shared gate fixtures, DISK-BACKED and centrally clearable.
  *
  * Several gates share expensive build-once artifacts across calls (the
  * materialized fact lattice, the ANN indexes, landed warehouses). Two
  * disciplines, both learned from driver-vs-builder bench divergence
  * (VERDICT r19 §"What's wrong" #1 and #4):
  *
  *  1. **Disk, not executor blocks.** A fixture kept as
  *     `localCheckpoint`/`persist` blocks makes every later query's
  *     steady time depend on those blocks staying resident — across a
  *     159-query sweep storage fills, blocks spill, and on a contended
  *     host the spill I/O republishes as phantom per-query regressions.
  *     A fixture written ONCE to session-temp parquet and re-read is a
  *     plain columnar scan: the OS page cache serves the hot case, a
  *     cold read is still one sequential scan, and nothing depends on
  *     Spark storage-memory pressure. This is also the deployment
  *     truth — shared artifacts live in durable storage, not in one
  *     job's block manager.
  *
  *  2. **Bounded, evictable.** The caches are keyed by
  *     `(SparkSession, corpus dir)` and never evict on their own — fine
  *     for one bench/verify run, unbounded for a long-lived session
  *     crossing many corpora. Every cache registers a clear thunk here;
  *     [[clear]] empties them all and deletes the temp dirs this object
  *     allocated. [[graft.Bench]] calls it when done; a resident service
  *     would call it between corpora.
  */
object Fixtures {

  private val clearers =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** Register a cache-clearing thunk (idempotent thunks please — clear
    * may run more than once per session). */
  def onClear(f: () => Unit): Unit = clearers.add(f)

  /** A fresh session-temp directory this registry will delete on
    * [[clear]]. */
  def tempDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-fix-$tag")
    dirs.add(d)
    d.toString
  }

  /** Materialize `df` to session-temp parquet ONCE and return the
    * read-back relation — the disk-backed fixture primitive. The
    * returned frame has no dependency on executor storage memory: its
    * plan is a parquet scan. */
  def disk(df: DataFrame, tag: String): DataFrame = {
    val path = tempDir(tag) + "/data"
    df.write.parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Empty every registered fixture cache and delete the temp dirs this
    * registry allocated. Safe to call repeatedly; the next gate call
    * simply rebuilds its fixture. */
  def clear(): Unit = {
    clearers.forEach(f => f())
    var d = dirs.poll()
    while (d != null) {
      scala.util.Try {
        java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      }
      d = dirs.poll()
    }
  }

  /** Best-effort reap of PER-QUERY transient blocks (lazy
    * localCheckpoints, spill-backed persists) a finished query left in
    * the block manager. With every CROSS-query fixture disk-backed (the
    * [[disk]] discipline), anything still persisted at a query boundary
    * is garbage awaiting the ContextCleaner — which only runs on GC, so
    * over a 159-query sweep blocks pile up, storage memory saturates,
    * and the next checkpoint-heavy query pays eviction I/O on whatever
    * host contention is around (the r19 driver-sweep mechanism).
    * Dropping them eagerly keeps storage near-empty at every boundary.
    * MUST NOT run mid-query (a live query's checkpointed RDDs have
    * truncated lineage — dropping their blocks kills it).
    *
    * BLOCKING by default (ADVICE r20): an async unpersist can overlap
    * the NEXT query's timed window — reintroducing a small version of
    * the eviction noise the reap exists to kill. The reap runs outside
    * every timed region, so the synchronous wait is free. */
  def reapTransients(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
}
