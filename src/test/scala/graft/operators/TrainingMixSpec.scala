package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingMixSpec extends SparkSpec {
  import spark.implicits._

  // 'en' marker-heavy filler that passes the quality gate (≥5 words, high
  // alpha ratio) — each doc gets a distinct tail so near-dup clustering
  // (jaccard 0.8) never merges distinct docs
  private def en(tail: String) =
    s"the cat and the dog is in a house of wonder it runs to $tail"

  private val corpus = Seq(
    (1L, en("green meadows far away"), "web"),
    (2L, en("blue rivers near town"), "web"),
    (3L, en("tall forests by night"), "web"),
    (4L, en("old castles on hills"), "books"),
    (5L, en("quiet harbors at dawn"), "books"),
    (6L, en("warm deserts under stars"), "books"),
    // 7 duplicates 1 exactly (case noise only) -> exact_duplicate, dropped
    (7L, en("green meadows far away").toUpperCase, "web"),
    // 8: too short -> low_quality
    (8L, "x", "web"),
    // 9: french -> wrong_language
    (9L, "le la et les des un une est le la et les des un une est", "books"),
    // 10: passes curation but leaks the eval span verbatim -> decontaminated
    (10L, "the answer is secret eval answer sequence alpha and it is in the text", "web")
  ).toDF("doc_id", "text", "source")

  private val eval = Seq((100L, "secret eval answer sequence alpha"))
    .toDF("doc_id", "text")

  test("build: curation, decontamination, mixture and packing compose") {
    val cfg = TrainingMix.Config(
      weights = Map("web" -> 0.6, "books" -> 0.4),
      budgetTokens = 200, shardTokens = 20)
    val mix = TrainingMix.build(corpus, "doc_id", "text", "source", cfg,
      eval = Some(eval))

    val plan = mix.plan.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    // availability counts ONLY cleared docs: web keeps 1,2,3 (7 dup, 8 lowq,
    // 10 contaminated), books keeps 4,5,6 (9 wrong lang) — 18 tokens each
    assert(plan.keySet == Set("web", "books"))
    assert(plan("web")._1 == 54L && plan("books")._1 == 54L)
    // 0.6*200=120 > 54 -> capped; 0.4*200=80 > 54 -> capped
    assert(plan("web")._3 == 1.0 && plan("books")._3 == 1.0)

    val packedIds = mix.packed.select("doc_id").as[Long].collect().toSet
    assert(packedIds == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"packed must be exactly the cleared docs at rate 1.0, got $packedIds")
    // shards restart per stratum and respect the 20-token budget:
    // 3 docs x 18 tokens -> offsets 0/18/36 -> shards 0,0,1
    val shards = mix.packed.groupBy("source").agg(max(col("shard_id")).as("m"))
      .as[(String, Long)].collect().toMap
    assert(shards == Map("web" -> 1L, "books" -> 1L))
  }

  test("optional stages: classifier gates junk, substring dedup shrinks availability") {
    // doc 11 passes the 0.4 heuristic gate (alpha*(1-punct) ~ 0.46) but
    // its punct-heavy tail is exactly what the learned gate rejects
    val withJunk = corpus.union(Seq(
      (11L, "the cat and the dog is in a house of wonder it runs to ### @@@ !!! %%% 123", "web")
    ).toDF("doc_id", "text", "source"))
    val punctGate = QualityClassifier.Model(Seq("punct_ratio"),
      means = Array(0.05), stds = Array(0.05), weights = Array(-3.0), bias = 0.0)
    val cfg = TrainingMix.Config(
      minQuality = 0.4,
      weights = Map("web" -> 0.6, "books" -> 0.4),
      budgetTokens = 200, shardTokens = 20,
      lrModel = Some(punctGate), minLrScore = 0.5,
      substringWindow = Some(8))
    val mix = TrainingMix.build(withJunk, "doc_id", "text", "source", cfg,
      eval = Some(eval))
    val packedIds = mix.packed.select("doc_id").as[Long].collect().toSet
    assert(packedIds == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"classifier must drop 11, curation the rest: $packedIds")
    // every doc shares the 14-token prefix; the substring stage keeps it
    // only in the canonical doc 1, so availability = 18 + 2x4 (web) and
    // 3x4 (books)
    val plan = mix.plan.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plan == Map("web" -> 26L, "books" -> 12L), s"got $plan")
  }

  test("substring stage publishes ORIGINAL-case text (detection still case-insensitive)") {
    // mixed-case corpus: every doc shares the capitalized 14-token prefix;
    // doc 21's prefix differs from the others only by case, so detection
    // (normalized windows) must still collapse it, while the published
    // canonical text keeps its original capitalization
    def cased(tail: String) =
      s"The Cat AND the Dog is in a House of Wonder it runs to $tail"
    val mixedCase = Seq(
      (21L, cased("green meadows far away"), "web"),
      (22L, cased("blue rivers near town").toLowerCase(java.util.Locale.ROOT), "web"),
      (23L, cased("tall forests by night"), "web")
    ).toDF("doc_id", "text", "source")
    val cfg = TrainingMix.Config(
      minQuality = 0.0, lang = None, jaccardThreshold = 0.99,
      weights = Map("web" -> 1.0), budgetTokens = 1000000L,
      shardTokens = 1000L, substringWindow = Some(8))
    val mix = TrainingMix.build(mixedCase, "doc_id", "text", "source", cfg)
    val texts = mix.packed.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    // canonical doc 21 keeps its prefix VERBATIM — capitals intact
    assert(texts(21L).startsWith("The Cat AND the Dog"),
      s"substring stage case-folded the canonical doc: ${texts(21L)}")
    // the non-canonical docs lose the shared prefix but keep their own tail
    // in original case (23's tail was never duplicated, so never rebuilt away)
    assert(texts(23L) == "tall forests by night", s"got ${texts(23L)}")
    assert(texts(22L) == "blue rivers near town", s"got ${texts(22L)}")
  }

  test("chunking stage: training-sized units, case + metadata preserved, strata carried") {
    val long = (1 to 3).map(i => (100L + i,
      ((1 to 60).map(w => s"Tok${i}x$w") ++ Seq("the", "and", "is")).mkString(" "),
      "web", s"https://ex.org/$i")).toDF("doc_id", "text", "source", "url")
    val cfg = TrainingMix.Config(
      minQuality = 0.0, lang = None, jaccardThreshold = 0.99,
      weights = Map("web" -> 1.0), budgetTokens = 1000000L,
      shardTokens = 100L, chunking = Some((16, 4)))
    val mix = TrainingMix.build(long, "doc_id", "text", "source", cfg)
    val packed = mix.packed
      .select(col("doc_id").cast("string"), col("text"), col("source"), col("url"))
      .as[(String, String, String, String)].collect()
    assert(packed.nonEmpty)
    packed.foreach { case (id, text, src, url) =>
      assert(id.contains("#"), s"chunked id expected, got $id")
      assert(text.split("\\s+").length <= 16, s"chunk over 16 tokens: $id")
      assert(src == "web")
      // re-granularization must not normalize the published text...
      assert(!text.contains("tok1x") && !text.contains("tok2x"),
        s"chunking lowercased training text: $text")
      // ...and must carry caller metadata without a re-join
      assert(url == s"https://ex.org/${id.split("#")(0).toLong - 100}")
    }
    // every source doc contributes several chunks; stride 12 over 63
    // tokens -> ceil((63-4)/12) = 5 chunks per doc
    val perDoc = packed.groupBy(_._1.split("#")(0)).view.mapValues(_.size)
    assert(perDoc.values.forall(_ == 5), s"per-doc chunk counts: ${perDoc.toMap}")
  }

  test("ccnet gate: the per-language tail bucket drops, head/middle survive") {
    // 30 docs, one language: the approximate thirds split must remove
    // ~the most atypical third before the mixture is planned
    val docs = (1L to 30L).map { i =>
      // doc i repeats common words, with increasing amounts of rare noise
      val common = Seq.fill(20)("the cat runs").mkString(" ")
      val noise = (1 to (i / 3).toInt).map(k => s"zq${i}w$k").mkString(" ")
      (i, s"$common $noise", "web", "en")
    }.toDF("doc_id", "text", "source", "lang")
    val cfg = TrainingMix.Config(
      minQuality = 0.0, lang = None, jaccardThreshold = 0.999,
      weights = Map("web" -> 1.0), budgetTokens = 1000000L,
      shardTokens = 10000L, ccnetLangCol = Some("lang"))
    val kept = TrainingMix.build(docs, "doc_id", "text", "source", cfg)
      .packed.select("doc_id").distinct().count()
    val all = TrainingMix.build(docs, "doc_id", "text", "source",
      cfg.copy(ccnetLangCol = None)).packed.select("doc_id").distinct().count()
    assert(kept < all, s"ccnet gate dropped nothing: $kept of $all")
    assert(kept >= all / 2, s"ccnet gate dropped more than the tail: $kept of $all")
  }

  test("ccnet gate: a NULL-language doc passes the gate instead of vanishing") {
    val docs = ((1L to 12L).map { i =>
      (i, Seq.fill(10)("the cat runs").mkString(" ") + s" zq$i", "web", "en")
    } :+ ((99L, "unscorable language doc with plenty of words here", "web",
      null.asInstanceOf[String]))).toDF("doc_id", "text", "source", "lang")
    val cfg = TrainingMix.Config(
      minQuality = 0.0, lang = None, jaccardThreshold = 0.999,
      weights = Map("web" -> 1.0), budgetTokens = 1000000L,
      shardTokens = 10000L, ccnetLangCol = Some("lang"))
    val ids = TrainingMix.build(docs, "doc_id", "text", "source", cfg)
      .packed.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(99L),
      "doc the bucketing could not score was silently dropped by the gate")
  }

  test("classifier gate preserves caller columns that collide with signal names") {
    // a corpus that already carries its OWN n_words / quality_score
    // columns (common in training-data frames) must come out of the
    // lrModel gate with the caller's values intact — not silently
    // recomputed from textCol by quality()'s withColumn
    val withMeta = corpus
      .withColumn("n_words", lit(-7))           // sentinel: not a real count
      .withColumn("quality_score", lit(99.5))   // sentinel: not in [0,1]
    val punctGate = QualityClassifier.Model(Seq("punct_ratio"),
      means = Array(0.05), stds = Array(0.05), weights = Array(-3.0), bias = 0.0)
    val cfg = TrainingMix.Config(
      weights = Map("web" -> 0.6, "books" -> 0.4),
      budgetTokens = 200, shardTokens = 20,
      lrModel = Some(punctGate), minLrScore = 0.5)
    val mix = TrainingMix.build(withMeta, "doc_id", "text", "source", cfg,
      eval = Some(eval))
    val metas = mix.packed.select("n_words", "quality_score")
      .as[(Int, Double)].collect()
    assert(metas.nonEmpty)
    metas.foreach { case (nw, qs) =>
      assert(nw == -7 && qs == 99.5,
        s"caller columns corrupted by the classifier gate: n_words=$nw quality_score=$qs")
    }
  }

  test("publish: (stratum, shard)-partitioned parquet, idempotent, conf untouched") {
    val cfg = TrainingMix.Config(
      weights = Map("web" -> 0.6, "books" -> 0.4),
      budgetTokens = 200, shardTokens = 20)
    val mix = TrainingMix.build(corpus, "doc_id", "text", "source", cfg,
      eval = Some(eval))
    val out = Files.createTempDirectory("graft-mix").toString
    TrainingMix.publish(mix, "source", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq == Seq("source=books", "source=web"))
    assert(new java.io.File(s"$out/source=web/shard_id=0").isDirectory &&
      new java.io.File(s"$out/source=web/shard_id=1").isDirectory)
    val first = spark.read.parquet(out)
    assert(first.count() == 6)
    // re-publish replaces, never duplicates, and never leaks session conf
    TrainingMix.publish(mix, "source", out)
    assert(spark.read.parquet(out).count() == 6)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"))
    // a re-publish with FEWER partitions must not leave stale directories
    // behind (a trainer reading outPath would silently include dropped
    // docs): shrink the mixture to books-only and publish again
    val shrunk = TrainingMix.Mixture(mix.plan,
      mix.packed.where(col("source") === "books"))
    TrainingMix.publish(shrunk, "source", out)
    val after = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(after.toSeq == Seq("source=books"),
      s"stale partitions survived a shrinking re-publish: ${after.mkString(", ")}")
    assert(spark.read.parquet(out).count() == 3)
  }
}
