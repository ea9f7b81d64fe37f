package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  // near-dup families: same 10-token base, one-token tails — 3-shingle
  // minhash puts same-family docs in shared LSH buckets
  private def doc(family: String, tail: String) =
    s"the $family quick brown fox jumps over the lazy dog near $tail"

  private val history = Seq(
    (1L, doc("red", "rivers")),
    (2L, doc("red", "mountains")),   // near-dup of 1 (history×history)
    (3L, doc("blue", "harbors"))
  ).toDF("doc_id", "text")

  private val fresh = Seq(
    (10L, doc("red", "valleys")),    // near-dup of history 1 and 2
    (11L, doc("green", "cities")),
    (12L, doc("green", "towns"))     // near-dup of 11 (new×new)
  ).toDF("doc_id", "text")

  test("incremental candidates = full-batch candidates touching the shard") {
    val store = Files.createTempDirectory("graft-store").toString
    DedupStore.save(history, "doc_id", "text", store)
    val inc = DedupStore.incrementalCandidates(fresh, "doc_id", "text",
        DedupStore.load(spark, store))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.minhashCandidates(history.union(fresh), "doc_id", "text")
      .where(col("i") >= 10 || col("j") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc == full, s"incremental $inc != batch-restricted $full")
    // the planted structure actually fired: mixed pairs AND a fresh pair,
    // and no history×history pair leaked
    assert(inc.keySet.exists { case (i, j) => i <= 3 && j >= 10 })
    assert(inc.keySet.contains((11L, 12L)))
    assert(!inc.keySet.exists { case (i, j) => i <= 3 && j <= 3 })
  }

  test("the store is scanned once and history text is never re-read") {
    val store = Files.createTempDirectory("graft-store2").toString
    DedupStore.save(history, "doc_id", "text", store)
    // history's TEXT is not even an input here — only the store relation
    val out = DedupStore.incrementalCandidates(fresh, "doc_id", "text",
      DedupStore.load(spark, store))
    val plan = out.queryExecution.executedPlan.toString
    val nStoreScans = "Scan parquet".r.findAllIn(plan).length
    assert(nStoreScans == 1,
      s"store must be scanned exactly once, saw $nStoreScans:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"went all-pairs:\n$plan")
  }

  test("incrementalVerdicts: keep-first — history wins, earliest shard member wins") {
    val store = Files.createTempDirectory("graft-store-v").toString
    DedupStore.save(history, "doc_id", "text", store)
    val v = DedupStore.incrementalVerdicts(fresh, "doc_id", "text",
        DedupStore.load(spark, store), threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(3))).toMap
    // 10 near-dups history 1 and 2 -> dup of the minimum (1)
    assert(v(10L) == ((Some(1L), true)), s"got ${v(10L)}")
    // 11's only counterpart is the LATER shard member 12 -> kept
    assert(v(11L) == ((None, false)))
    // 12 dups the earlier shard member 11
    assert(v(12L) == ((Some(11L), true)))
  }

  test("transitive collapse composes: incremental pairs -> clustersFromEdges") {
    val store = Files.createTempDirectory("graft-store-cc").toString
    DedupStore.save(history, "doc_id", "text", store)
    val pairs = DedupStore.incrementalCandidates(fresh, "doc_id", "text",
        DedupStore.load(spark, store))
      .where(col("est_sim") >= 0.5).select("i", "j")
    val everyone = history.select("doc_id").union(fresh.select("doc_id"))
    val clusters = Dedup.clustersFromEdges(everyone, pairs, "doc_id")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    // 10's history near-dups 1,2 and 10 itself share one component rooted
    // at 1; the fresh 11-12 pair roots at 11; 3 stays a singleton
    assert(clusters(10L) == 1L && clusters(2L) == 1L && clusters(1L) == 1L)
    assert(clusters(11L) == 11L && clusters(12L) == 11L)
    assert(clusters(3L) == 3L)
  }

  test("edge cases: empty shard and unrelated shard both yield zero pairs") {
    val store = Files.createTempDirectory("graft-store-e").toString
    DedupStore.save(history, "doc_id", "text", store)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupStore.incrementalCandidates(empty, "doc_id", "text",
      DedupStore.load(spark, store)).count() == 0)
    val unrelated = Seq((30L, "completely different subject matter entirely unrelated on purpose"))
      .toDF("doc_id", "text")
    assert(DedupStore.incrementalCandidates(unrelated, "doc_id", "text",
      DedupStore.load(spark, store)).count() == 0)
    val v = DedupStore.incrementalVerdicts(unrelated, "doc_id", "text",
      DedupStore.load(spark, store)).as[(Long, Option[Long], Option[Double], Boolean)]
      .collect()
    assert(v.toSeq == Seq((30L, None, None, false)))
  }

  test("append grows the store: the next shard dedups against prior shards") {
    val store = Files.createTempDirectory("graft-store3").toString
    DedupStore.save(history, "doc_id", "text", store)
    DedupStore.append(fresh, "doc_id", "text", store)
    val next = Seq((20L, doc("green", "ports"))).toDF("doc_id", "text")
    val pairs = DedupStore.incrementalCandidates(next, "doc_id", "text",
        DedupStore.load(spark, store))
      .select("i", "j").as[(Long, Long)].collect().toSet
    // finds the near-dups from the APPENDED shard, not just the original
    assert(pairs.contains((11L, 20L)) && pairs.contains((12L, 20L)),
      s"appended-shard near-dups missed: $pairs")
  }

  test("bloom prefilter: output identical to the plain path, zero false negatives") {
    val store = Files.createTempDirectory("graft-store-bloom").toString
    DedupStore.save(history, "doc_id", "text", store)
    val loaded = DedupStore.load(spark, store)
    val bloom = DedupStore.bloomOf(loaded, expectedItems = 100)

    // every TRUE store key must pass the native probe — the no-false-
    // negative guarantee the output identity rests on
    val probe = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.Bridge.expression(
          concat_ws(":", col("band"), col("band_hash"))), bloom))
    assert(loaded.where(!probe).count() == 0, "store key failed its own bloom")

    val plain = DedupStore.incrementalCandidates(fresh, "doc_id", "text", loaded)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bloomed = DedupStore.incrementalCandidatesBloom(
        fresh, "doc_id", "text", loaded, bloom)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(bloomed == plain, s"bloom path diverged: $bloomed != $plain")
  }

  test("bloom prefilter actually drops novel band rows before the join") {
    val store = Files.createTempDirectory("graft-store-bloom2").toString
    DedupStore.save(history, "doc_id", "text", store)
    val loaded = DedupStore.load(spark, store)
    val bloom = DedupStore.bloomOf(loaded, expectedItems = 100)
    // 50 documents of unique vocabulary: none of their bands exist in
    // history, so at fpp 1% virtually all rows must die at the scan
    val novel = (100L to 149L).map(i =>
      (i, s"zq$i xv$i wk$i uj$i th$i rg$i pf$i ne$i mc$i lb$i ka$i"))
      .toDF("doc_id", "text")
    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(novel, "doc_id", "text"), "doc_id")
    val probe = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graft.Bridge.expression(
          concat_ws(":", col("band"), col("band_hash"))), bloom))
    val total = bands.count()
    val surviving = bands.where(probe).count()
    assert(surviving < total / 10,
      s"prefilter kept $surviving of $total novel band rows — not pruning")
  }
}
