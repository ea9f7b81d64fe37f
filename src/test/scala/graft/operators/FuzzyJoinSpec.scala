package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[FuzzyJoin]]: symmetric-deletion blocking must be EXACT (== the
  * all-pairs levenshtein join) while generating far fewer candidate
  * pairs than n² on varied keys, with keyed-join plans only. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // varied entity names: clusters of typo'd variants + singletons
  private val names = Seq(
    (1L, "jonathan smith"), (2L, "jonathan smyth"),   // sub, d=1
    (3L, "jonathon smith"),                           // sub vs 1, d=2 vs 2
    (4L, "jon smith"),
    (5L, "acme corp"), (6L, "acme corp."),            // ins, d=1
    (7L, "acme inc"),
    (8L, "globex"), (9L, "globexx"), (10L, "lobex"),  // ins / del of 8
    (11L, "initech"), (12L, "intech"),                // del, d=1
    (13L, "umbrella research division"),
    (14L, "wayne enterprises"),
    (15L, ""), (16L, "a"), (17L, "b"),                // empty/1-char edges
    (18L, "jonathan smith"))                          // exact dup of 1

  private def brute(k: Int) = {
    val df = names.toDF("id", "s")
    val o = df.select(col("id").as("id2"), col("s").as("s2"))
    df.join(o, col("id") < col("id2") &&
        levenshtein(col("s"), col("s2")) <= k)
      .select(col("id").as("a_id"), col("id2").as("b_id"),
        levenshtein(col("s"), col("s2")).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def got(k: Int) =
    FuzzyJoin.selfJoin(names.toDF("id", "s"), "id", "s", maxDist = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("selfJoin k=1 == brute-force all-pairs; dist values exact") {
    val want = brute(1)
    assert(want.nonEmpty && got(1) == want)
    assert(want.contains((1L, 18L, 0)), "exact duplicates pair at dist 0")
    assert(want.contains((15L, 16L, 1)), "empty vs 1-char is dist 1")
  }

  test("selfJoin k=2 == brute-force all-pairs (two deletions each side)") {
    val want = brute(2)
    assert(got(2) == want)
    assert(want.contains((2L, 3L, 2)), "needs radius-2 neighborhoods")
  }

  test("two-table join: typo'd queries resolve against a reference list") {
    val ref = names.toDF("id", "s")
    val q = Seq((100L, "jonathn smith"), (101L, "glob"), (102L, "initech"))
      .toDF("qid", "qs")
    val res = FuzzyJoin.join(q, "qid", "qs", ref, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(res == Set((100L, 1L, 1), (100L, 18L, 1), (100L, 3L, 1),
      (102L, 11L, 0), (102L, 12L, 1)), s"got $res")
  }

  test("null keys drop like any equi-join; unicode counts characters not bytes") {
    val withNull = (names :+ (99L, null.asInstanceOf[String])).toDF("id", "s")
    assert(FuzzyJoin.selfJoin(withNull, "id", "s", 1).collect().length ==
      brute(1).length)
    val uni = Seq((1L, "café"), (2L, "cafe"), (3L, "caf")).toDF("id", "s")
    val r = FuzzyJoin.selfJoin(uni, "id", "s", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(r == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("blocking scale: candidates ≪ n² on varied keys; plan is keyed joins only") {
    // 2000 distinct-ish words: candidate pairs must be output-scale,
    // nowhere near the 2M of all-pairs
    val n = 2000
    val base = (0 until n).map { i =>
      (i.toLong, f"entity_${i % 37}%02d_${i}%04d_${"abcdefg" (i % 7)}")
    }
    // plant 20 known typo twins (one substituted char → dist 1)
    val twins = (0 until 20).map { i =>
      (10000L + i, base(i * 100)._2.updated(8, 'X'))
    }
    val df = (base ++ twins).toDF("id", "s")
    val keys = df.select(col("id"), col("s"),
      explode(FuzzyJoin.deletionVariants(col("s"), 1)).as("v"))
    val cands = keys.as("l").join(keys.as("r"), "v")
      .where(col("l.id") < col("r.id"))
      .select(col("l.id"), col("r.id")).distinct().count()
    assert(cands < n.toLong * n / 100,
      s"$cands candidate pairs — blocking is not blocking")

    val joined = FuzzyJoin.selfJoin(df, "id", "s", 1)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs plan:\n$plan")
    // the planted twins are all found
    val pairs = joined.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert((0 until 20).forall(i => pairs((i * 100L, 10000L + i))),
      s"missing planted twins in $pairs")
  }

  test("entity resolution composition: fuzzy edges -> connected components -> golden records (the q_entity_resolution chain)") {
    // the 2020-key fixture again: 2000 singletons + 20 typo twins
    val n = 2000
    val base = (0 until n).map { i =>
      (i.toLong, f"entity_${i % 37}%02d_${i}%04d_${"abcdefg" (i % 7)}")
    }
    // unique substitution char per twin: a shared 'X' would make twins of
    // same-pattern bases dist-1 of EACH OTHER and chain their clusters
    val twins = (0 until 20).map { i =>
      (10000L + i, base(i * 100)._2.updated(8, ('A' + i).toChar))
    }
    val df = (base ++ twins).toDF("id", "s")
    val edges = FuzzyJoin.selfJoin(df, "id", "s", 1)
      .select(col("a_id").as("i"), col("b_id").as("j"))
    val clustered = Dedup.clustersFromEdges(df, edges, "id")
    val byId = clustered.select(col("id").cast("long"),
        col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    // every twin resolves into its base word's entity (min member = base)
    (0 until 20).foreach { i =>
      assert(byId(10000L + i) == i * 100L && byId(i * 100L) == i * 100L)
    }
    assert(byId.values.toSet.size == n, "expected 2000 entities")

    // golden records: per entity, each attribute from the highest-`bal`
    // record where present — the twin (higher id ⇒ higher bal) wins
    // `name_len`, and only twin clusters have a non-null `src`
    val recs = df
      .join(clustered.select(col("id"), col("cluster_id")), Seq("id"))
      .select(col("cluster_id").cast("long").as("cluster_id"),
        col("id").cast("double").as("bal"), col("id"),
        when(col("id") >= 10000L, lit("typo")).as("src"),
        length(col("s")).cast("long").as("name_len"))
    val golden = Survivorship.golden(recs, Seq("cluster_id"), "bal", "id",
        Seq("src", "name_len"))
      .select(col("cluster_id"), col("src"), col("name_len"), col("n_records"))
      .as[(Long, Option[String], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(golden.size == n)
    (0 until 20).foreach { i =>
      val (src, len, cnt) = golden(i * 100L)
      assert(src.contains("typo") && cnt == 2L &&
        len == twins(i)._2.length.toLong,
        s"twin cluster ${i * 100}: ($src, $len, $cnt)")
    }
    val single = golden(1L) // id 1 has no twin
    assert(single._1.isEmpty && single._3 == 1L)
  }

  test("deletionVariants: exact neighborhood, distinct, empty-string safe") {
    val v1 = spark.range(1).select(
        FuzzyJoin.deletionVariants(lit("abc"), 1).as("v"))
      .as[Seq[String]].head().toSet
    assert(v1 == Set("abc", "bc", "ac", "ab"))
    val v2 = spark.range(1).select(
        FuzzyJoin.deletionVariants(lit("ab"), 2).as("v"))
      .as[Seq[String]].head().toSet
    assert(v2 == Set("ab", "a", "b", ""))
    val v0 = spark.range(1).select(
        FuzzyJoin.deletionVariants(lit(""), 2).as("v"))
      .as[Seq[String]].head().toSet
    assert(v0 == Set(""))
  }
}
