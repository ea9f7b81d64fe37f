package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("decontaminate == plain-Scala n-gram set intersection (random corpora)") {
    // small vocabulary forces real collisions
    def randDoc(): String =
      List.fill(5 + rnd.nextInt(20))(s"w${rnd.nextInt(12)}").mkString(" ")
    for (_ <- 1 to 10) {
      val corpus = (1L to 8L).map(i => (i, randDoc()))
      val eval = (101L to 103L).map(i => (i, randDoc()))
      def gramsOf(t: String) = t.split(" ").toList.sliding(3)
        .filter(_.size == 3).map(_.mkString(" ")).toSet
      val expected = (for {
        (ci, ct) <- corpus; (ei, et) <- eval
        shared = (gramsOf(ct) & gramsOf(et)).size if shared >= 2
      } yield (ci, ei) -> ((shared.toLong, shared.toDouble / gramsOf(ct).size))).toMap
      val got = CorpusOps.decontaminate(corpus.toDF("doc_id", "text"),
          eval.toDF("eval_id", "etext"), "doc_id", "text", "eval_id", "etext",
          n = 3, minOverlap = 2)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got == expected, s"corpus: $corpus eval: $eval")
    }
  }

  test("stratifiedSample membership == md5-threshold reference, row by row") {
    val rates = Map("a" -> 0.3, "b" -> 0.85)
    def hexT(rate: Double) = f"${(rate * (1L << 32)).toLong}%08x"
    for (_ <- 1 to 10) {
      val rows = List.fill(200)((rnd.nextLong().abs % 100000, if (rnd.nextBoolean()) "a" else "b"))
        .distinct
      val expected = rows.filter { case (id, s) =>
        md5hex(s"sample|$id").take(8) < hexT(rates(s))
      }.map(_._1).toSet
      val got = CorpusOps.stratifiedSample(rows.toDF("id", "src"), "id", "src",
          rates, defaultRate = 0.0)
        .select("id").as[Long].collect().toSet
      assert(got == expected)
    }
  }

  test("packShards shard ids == running-offset reference per stratum") {
    for (_ <- 1 to 10) {
      val rows = (1L to 50L).map { i =>
        (i, List.fill(1 + rnd.nextInt(30))("t").mkString(" "), s"s${i % 3}")
      }
      val expected = rows.groupBy(_._3).flatMap { case (_, docs) =>
        var cum = 0L
        docs.sortBy(_._1).map { case (id, text, _) =>
          val n = text.split(" ").length.toLong
          val shard = (cum / 7)
          val offset = cum - shard * 7
          cum += n
          id -> ((shard, offset))
        }
      }
      val got = CorpusOps.packShards(rows.toDF("doc_id", "text", "source"),
          "doc_id", "text", "source", budgetTokens = 7)
        .select("doc_id", "shard_id", "shard_offset")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected)
      // a doc's tokens start inside its shard's budget window
      assert(got.values.forall { case (_, off) => off >= 0 && off < 7 })
    }
  }

  test("decontaminate flags verbatim n-gram leaks, not shared vocabulary") {
    val corpus = Seq(
      (1L, "the secret benchmark answer is forty two exactly"), // leaked verbatim run
      (2L, "benchmark the answer forty secret is two words"),   // same words, shuffled
      (3L, "completely unrelated text about gardens and rain"),
      (4L, "too short") // sub-n words: no grams, must not error
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "we note the secret benchmark answer is forty two exactly here")
    ).toDF("eval_id", "etext")
    val hits = CorpusOps.decontaminate(corpus, eval, "doc_id", "text",
        "eval_id", "etext", n = 4, minOverlap = 2)
      .select("doc_id", "eval_id", "n_shared").as[(Long, Long, Long)]
      .collect().toSeq
    // doc 1 shares the 4-gram run; docs 2/3 share no 4-gram at all
    assert(hits.map(h => (h._1, h._2)) == Seq((1L, 100L)))
    assert(hits.head._3 >= 2)
    val frac = CorpusOps.decontaminate(corpus, eval, "doc_id", "text",
        "eval_id", "etext", n = 4, minOverlap = 2)
      .select("overlap_frac").as[Double].head()
    assert(frac == 1.0) // every 4-gram of doc 1 appears in the eval doc
  }

  test("decontaminate never builds doc × eval pairs — the join is on the gram") {
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val plan = CorpusOps.decontaminate(corpus, eval, "doc_id", "text",
        "doc_id", "text", n = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"decontaminate must stay an equi-join:\n$plan")
  }

  test("stratifiedSample: deterministic, rate-proportional, stratum-independent") {
    val df = (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val rates = Map("src0" -> 0.8, "src1" -> 0.25, "src2" -> 0.0)
    def run() = CorpusOps.stratifiedSample(df, "id", "src", rates, defaultRate = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val counts = run()
    assert(counts == run()) // reproducible, not rand()
    assert(!counts.contains("src2")) // rate 0 keeps nothing
    assert(math.abs(counts("src0") - 800.0) < 80, s"src0: ${counts("src0")}")
    assert(math.abs(counts("src1") - 250.0) < 80, s"src1: ${counts("src1")}")
    assert(math.abs(counts("src3") - 500.0) < 80, s"src3 default: ${counts("src3")}")
    // changing one stratum's rate must not change another stratum's sample
    val kept1 = CorpusOps.stratifiedSample(df, "id", "src", rates, 0.5)
      .where($"src" === "src1").select("id").as[Long].collect().toSet
    val kept1b = CorpusOps.stratifiedSample(df, "id", "src",
        rates.updated("src0", 0.1), 0.5)
      .where($"src" === "src1").select("id").as[Long].collect().toSet
    assert(kept1 == kept1b)
  }

  test("packShards: offset sharding fills to budget, overflow bounded by one doc") {
    val docs = (1L to 30L).map(i => (i, Seq.fill(100)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val shards = CorpusOps.packShards(docs, "doc_id", "text", "source", 250)
      .select("doc_id", "n_tokens", "shard_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(shards.forall(_._2 == 100))
    // offsets 0,100,200 -> shard 0; 300,400 -> shard 1 ...
    assert(shards.take(5).map(_._3).toSeq == Seq(0L, 0L, 0L, 1L, 1L))
    // every shard's token total is in [budget - maxDoc + 1, budget + maxDoc)
    val perShard = shards.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    perShard.toSeq.sortBy(_._1).init.foreach { case (sid, tot) =>
      assert(tot > 250 - 100 && tot < 250 + 100, s"shard $sid holds $tot tokens")
    }
    // shards restart per stratum
    val two = CorpusOps.packShards(
        Seq((1L, "a b c", "x"), (2L, "d e f", "y")).toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", 2)
      .select("source", "shard_id").as[(String, Long)].collect().toMap
    assert(two == Map("x" -> 0L, "y" -> 0L))
  }

  test("mixturePlan rates realize target weights; mixtureSample == stratifiedSample at those rates") {
    // 3 strata × 40 docs × 5 tokens = 200 tokens each
    val docs = spark.range(120).select(col("id").as("doc_id"),
      lit("one two three four five").as("text"),
      concat(lit("s"), (col("id") % 3)).as("source"))
    val plan = CorpusOps.mixturePlan(docs, "text", "source",
      Map("s0" -> 0.5, "s1" -> 0.5), budgetTokens = 200)
    val rows = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // s2 has no weight -> excluded; 0.5 * 200 = 100 targeted of 200 available
    assert(rows.keySet == Set("s0", "s1"))
    assert(rows("s0") == ((200L, 0.5, 100L, 0.5)))
    // over-subscription caps at 1.0 instead of over-sampling
    val capped = CorpusOps.mixturePlan(docs, "text", "source",
        Map("s0" -> 1.0), budgetTokens = 100000)
      .select("rate").as[Double].head()
    assert(capped == 1.0)
    // applying the plan picks exactly the md5-threshold rows — the same
    // membership stratifiedSample computes from a literal rate map
    val viaPlan = CorpusOps.mixtureSample(docs, "doc_id", "source", plan)
      .select("doc_id").as[Long].collect().toSet
    val viaLiteral = CorpusOps.stratifiedSample(docs, "doc_id", "source",
        Map("s0" -> 0.5, "s1" -> 0.5), defaultRate = 0.0, salt = "mix")
      .select("doc_id").as[Long].collect().toSet
    assert(viaPlan == viaLiteral && viaPlan.nonEmpty)
  }

  test("rate >= 1.0 keeps EVERY row exactly (not just probabilistically)") {
    // a capped hex threshold of ffffffff still drops a doc whose bucket is
    // exactly ffffffff (strict compare, ~1 in 2^32) — 'sample everything'
    // must be exact, so rate 1.0 bypasses the bucket filter entirely
    val docs = spark.range(500).select(col("id").as("doc_id"),
      lit("one two three four five").as("text"),
      concat(lit("s"), (col("id") % 2)).as("source"))
    val viaLiteral = CorpusOps.stratifiedSample(docs, "doc_id", "source",
      Map("s0" -> 1.0, "s1" -> 1.0)).count()
    assert(viaLiteral == 500L)
    val plan = Seq(("s0", 1.0), ("s1", 1.0)).toDF("source", "rate")
    val viaPlan = CorpusOps.mixtureSample(docs, "doc_id", "source", plan).count()
    assert(viaPlan == 500L)
  }

  test("importanceSample: keep-probability tracks the per-doc weight, deterministic") {
    val docs = spark.range(4000).select(col("id").as("doc_id"),
      when(col("id") % 4 === 0, 1.0)       // always kept
        .when(col("id") % 4 === 1, 0.0)    // never kept
        .when(col("id") % 4 === 2, 0.5)    // ~half
        .otherwise(0.1).as("w"))           // ~tenth
    val kept = CorpusOps.importanceSample(docs, "doc_id", "w")
      .select("doc_id", "w").as[(Long, Double)].collect()
    val byW = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byW(1.0) == 1000, "weight 1.0 must keep every row exactly")
    assert(!byW.contains(0.0), "weight 0.0 must keep nothing")
    assert(math.abs(byW(0.5) - 500) < 80, s"w=0.5 kept ${byW(0.5)}")
    assert(math.abs(byW(0.1) - 100) < 50, s"w=0.1 kept ${byW(0.1)}")
    // md5-deterministic: same input, same kept set
    val again = CorpusOps.importanceSample(docs, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("takeStratified: EXACTLY n per over-cap stratum, ranks stable under any n") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      when(col("id") < 200, "big").when(col("id") < 290, "mid")
        .otherwise("tiny").as("source"))
    val out = CorpusOps.takeStratified(docs, "doc_id", "source", n = 50)
      .select("doc_id", "source", "sample_rank")
      .as[(Long, String, Int)].collect().toSeq
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    // exact for over-cap strata, everything for the under-cap one
    assert(bySrc == Map("big" -> 50, "mid" -> 50, "tiny" -> 10), s"$bySrc")
    // ranks are 1..k dense per stratum
    assert(out.filter(_._2 == "big").map(_._3).sorted == (1 to 50).toSeq)
    // md5 order, not id order
    assert(out.filter(_._2 == "big").map(_._1).toSet != (0L until 50L).toSet)
    // deterministic, and the first n are UNCHANGED when n grows (ranks
    // do not depend on n) — growing an eval set keeps its prefix
    val wider = CorpusOps.takeStratified(docs, "doc_id", "source", n = 80)
      .select("doc_id", "sample_rank").as[(Long, Int)].collect().toMap
    out.foreach { case (id, _, r) => assert(wider(id) == r) }
  }

  test("splitCorpus: disjoint, exhaustive, fraction-proportional, growth-stable") {
    val docs = spark.range(5000).select(col("id").as("doc_id"))
    val split = CorpusOps.splitCorpus(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // exhaustive: every doc in exactly one split (withColumn can't drop
    // or duplicate rows, so summing proves it)
    assert(counts.values.sum == 5000L)
    // binomial around the fractions (5 sigma)
    assert(math.abs(counts("train") - 4000) < 150, s"train=${counts("train")}")
    assert(math.abs(counts("valid") - 500) < 110, s"valid=${counts("valid")}")
    assert(math.abs(counts("test") - 500) < 110, s"test=${counts("test")}")
    // growth-stable: the same doc keeps its split when the corpus shrinks
    // or grows — membership is a pure per-doc hash
    val subset = CorpusOps.splitCorpus(
        docs.where(col("doc_id") < 1000), "doc_id",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = split.where(col("doc_id") < 1000)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(subset == full)
    // validation: fractions must sum to 1, names must be distinct
    intercept[IllegalArgumentException] {
      CorpusOps.splitCorpus(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      CorpusOps.splitCorpus(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    // single split takes everything (no bucket compare at all)
    assert(CorpusOps.splitCorpus(docs, "doc_id", Seq("all" -> 1.0))
      .where(col("split") === "all").count() == 5000L)
  }

  test("negative weights/rates keep NOTHING (not ~everything)") {
    // floor(negative × 2^32) runs through conv() as unsigned 64-bit and the
    // 8-char lpad TRUNCATES it to 'ffffffff' — without the > 0 guard a raw
    // logit weight of -0.5 would keep ~100% of rows where min(1, max(0, w))
    // semantics says probability 0
    val docs = spark.range(200).select(col("id").as("doc_id"),
      lit(-0.5).as("w"), lit("s0").as("source"))
    assert(CorpusOps.importanceSample(docs, "doc_id", "w").count() == 0L,
      "negative weight must keep nothing")
    val plan = Seq(("s0", -0.5)).toDF("source", "rate")
    assert(CorpusOps.mixtureSample(docs, "doc_id", "source", plan).count() == 0L,
      "negative plan rate must keep nothing")
  }

  test("packShards rejects stratum names containing '#' when splitting is on") {
    // "web#3" as a RAW stratum would collide with sub-stratum 3 of a split
    // "web" — one packing window and one output partition for unrelated
    // docs. The census-side validation fires before any packing happens.
    val docs = Seq((1L, "a b c", "web#3"), (2L, "d e f", "web"))
      .toDF("doc_id", "text", "source")
    val e = intercept[Exception] {
      CorpusOps.packShards(docs, "doc_id", "text", "source",
        budgetTokens = 10, maxStratumDocs = Some(1L)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("sub-stratum separator")),
      s"expected the separator rejection, got: $e")
    // without splitting the name is legal (no sub-stratum keys exist)
    assert(CorpusOps.packShards(docs, "doc_id", "text", "source",
      budgetTokens = 10).count() == 2L)
  }

  test("takeWeighted == plain-Scala A-ES reference, rank-stable under n") {
    def u(id: Long): Double =
      (java.lang.Long.parseLong(md5hex(s"wtake|$id").take(8), 16) + 1.0) / 4294967296.0
    val rows = (1L to 120L).map(i => (i, s"s${i % 3}", (10 + i % 50).toDouble))
    val df = rows.toDF("id", "src", "w")
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val maxW = rs.map(_._3).max
      rs.sortBy { case (id, _, w) =>
        // Spark round() = BigDecimal.valueOf(x).setScale(6, HALF_UP);
        // per-stratum max-normalized like the operator
        (-java.math.BigDecimal.valueOf(math.log(u(id)) * maxW / w)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(), id)
      }.take(10).zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1) }
    }
    val got = CorpusOps.takeWeighted(df, "id", "src", "w", n = 10)
      .select("id", "sample_rank").as[(Long, Int)].collect().toMap
    assert(got == expected)
    // growing n keeps the first picks (rank-stable eval growth)
    val grown = CorpusOps.takeWeighted(df, "id", "src", "w", n = 25)
      .select("id", "sample_rank").as[(Long, Int)].collect().toMap
    got.foreach { case (id, r) => assert(grown(id) == r, s"id $id rank moved") }
    // A-ES is scale-invariant and the key is max-normalized, so byte-count
    // magnitude weights (~1e9) must reproduce the SAME draw — the round-6
    // quantum must not collapse large-weight keys into min-id selection
    val scaled = CorpusOps.takeWeighted(
        df.withColumn("w", col("w") * 1e9), "id", "src", "w", n = 10)
      .select("id", "sample_rank").as[(Long, Int)].collect().toMap
    assert(scaled == got, "1e9-scaled weights changed the draw")
  }

  test("takeWeighted: weight-proportional inclusion, non-positive weights excluded") {
    // two strata-less populations: heavy docs (w=100) vs light (w=1);
    // heavy should dominate the sample overwhelmingly
    val rows = (1L to 400L).map(i =>
      (i, "s", if (i <= 200) 100.0 else 1.0)) ++
      Seq((401L, "s", 0.0), (402L, "s", -5.0))
    val out = CorpusOps.takeWeighted(rows.toDF("id", "src", "w"),
        "id", "src", "w", n = 50)
      .select("id").as[Long].collect().toSet
    assert(!out.contains(401L) && !out.contains(402L), "w <= 0 must never sample")
    val heavy = out.count(_ <= 200)
    assert(heavy >= 40, s"only $heavy/50 heavy docs sampled — not weight-proportional")
  }
}
