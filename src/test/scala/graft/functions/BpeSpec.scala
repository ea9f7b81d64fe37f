package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the most frequent pair each round, deterministically") {
    // 'lo' dominates: low x3, lower, lowest  (l,o) count 5 beats all
    val merges = Bpe.train(Seq("low low low lower lowest"), 3)
    assert(merges.head == (("l", "o")))
    // second round: (lo, w</w>) appears 3x ("low"), (lo, w) appears 2x
    // ("lower", "lowest") — the word-final variant wins
    assert(merges(1) == (("lo", "w</w>")))
    // same input, same table — ties resolved lexicographically
    assert(Bpe.train(Seq("low low low lower lowest"), 3).toSeq == merges.toSeq)
  }

  test("reference encoder applies merges greedily by rank") {
    val merges = Seq(("l", "o"), ("lo", "w</w>"), ("e", "r</w>"))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encode("low", ranks) == Vector("low</w>"))
    assert(Bpe.encode("lower", ranks) == Vector("lo", "w", "er</w>"))
    assert(Bpe.encode("x", ranks) == Vector("x</w>"))
    // no applicable merge: pure character fallback
    assert(Bpe.encode("ab", Map.empty) == Vector("a", "b</w>"))
  }

  test("expression == reference encoder on random corpora (property)") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abcdef"
    def word() = (0 until (1 + rnd.nextInt(8)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 5) {
      val corpus = (0 until 60).map(_ =>
        (0 until (1 + rnd.nextInt(12))).map(_ => word()).mkString(" "))
      val merges = Bpe.train(corpus, numMerges = 20 + trial * 15).toSeq
      // encode a DIFFERENT sample than the training one (plus the training
      // rows themselves) through the expression
      val texts = corpus.take(20) ++ (0 until 40).map(_ =>
        (0 until (1 + rnd.nextInt(10))).map(_ => word()).mkString(" "))
      val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), TextFunctions.bpeTokens(col("text"), merges).as("toks"))
        .as[(Long, Seq[String])].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val expected = Bpe.encodeText(t, merges)
        assert(out(i.toLong) == expected,
          s"trial $trial text '$t': ${out(i.toLong)} != $expected")
      }
    }
  }

  test("non-BMP codepoints stay whole: one symbol per emoji, no '?' mangling") {
    // char-by-char splitting would break a surrogate pair into two lone
    // surrogates that UTF8String encodes as '?' — '🙂' and '🙃' would then
    // produce IDENTICAL token arrays
    val happy = "hi 🙂"   // 🙂 (U+1F642)
    val upside = "hi 🙃"  // 🙃 (U+1F643)
    val merges = Bpe.train(Seq("hi hi hi"), 5).toSeq
    val out = Seq((1L, happy), (2L, upside)).toDF("id", "text")
      .select(col("id"), TextFunctions.bpeTokens(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) != out(2L), "distinct emoji must tokenize distinctly")
    assert(!out(1L).exists(_.contains("?")), s"mangled surrogates: ${out(1L)}")
    assert(out(1L) == Bpe.encodeText(happy, merges),
      s"expression ${out(1L)} != reference ${Bpe.encodeText(happy, merges)}")
    // the emoji is ONE symbol carrying the end-of-word marker
    assert(out(1L).last == "🙂" + Bpe.EndOfWord)
  }

  test("graft_bpe rejects NULL merge tables with a clean message, not an NPE") {
    val df = Seq((1L, "low")).toDF("id", "text")
    val eNull = intercept[Exception] {
      df.select(call_function("graft_bpe", col("text"),
        lit(null).cast("array<string>"))).collect()
    }
    assert(eNull.getMessage.contains("NULL"), s"got: ${eNull.getMessage}")
    val eElem = intercept[Exception] {
      df.select(call_function("graft_bpe", col("text"),
        array(lit("l o"), lit(null).cast("string")))).collect()
    }
    assert(eElem.getMessage.contains("NULL"), s"got: ${eElem.getMessage}")
  }

  test("subwords reassemble the original normalized words") {
    val corpus = Seq("the quick brown fox", "the lazy dog", "quick quick fox")
    val merges = Bpe.train(corpus, 30).toSeq
    corpus.flatMap(_.split(" ")).foreach { w =>
      val toks = Bpe.encode(w, merges.zipWithIndex.toMap)
      assert(toks.mkString.stripSuffix(Bpe.EndOfWord) == w,
        s"'$w' did not reassemble from $toks")
      assert(toks.last.endsWith(Bpe.EndOfWord))
    }
  }

  test("graft_bpe SQL function == the library column (literal merge table)") {
    val merges = Bpe.train(Seq("low low low lower lowest"), 5).toSeq
    val litArr = array(merges.map { case (a, b) => lit(s"$a $b") }: _*)
    val df = Seq((1L, "low lower"), (2L, "LOWEST low")).toDF("id", "text")
    val out = df.select(col("id"),
        call_function("graft_bpe", col("text"), litArr).as("sql_toks"),
        TextFunctions.bpeTokens(col("text"), merges).as("lib_toks"))
      .as[(Long, Seq[String], Seq[String])].collect()
    out.foreach { case (id, s, l) => assert(s == l, s"row $id: $s != $l") }
    // non-literal merges are rejected up front (query-constant contract)
    val e = intercept[Exception] {
      df.select(call_function("graft_bpe", col("text"), split(col("text"), " ")))
        .collect()
    }
    assert(e.getMessage.contains("literal"), s"got: ${e.getMessage}")
  }

  test("packShards budgets by real BPE counts when given the counter") {
    val corpus = Seq(
      (1L, "aaaa aaaa aaaa", "s"),   // merges collapse each word to 1 token
      (2L, "aaaa aaaa aaaa", "s"),
      (3L, "aaaa aaaa aaaa", "s"))
      .toDF("doc_id", "text", "src")
    val merges = Bpe.train(Seq("aaaa aaaa"), 10).toSeq
    val bpeCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => size(TextFunctions.bpeTokens(c, merges)).cast("long")
    val packed = graft.operators.CorpusOps.packShards(
        corpus, "doc_id", "text", "src", budgetTokens = 6, tokensOf = bpeCount)
      .select("doc_id", "n_tokens", "shard_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 'aaaa' fully merges to one subword -> 3 bpe tokens per doc (vs 3 ws
    // words too, but offsets prove the counter is live: budget 6 splits
    // after two docs). n_tokens must be the BPE count.
    assert(packed.map(_._2) == Seq(3L, 3L, 3L))
    assert(packed.map(_._3) == Seq(0L, 0L, 1L), s"shards: $packed")
  }

  test("trained-table token counts compress vs characters, never vs words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainOn(docs.orderBy("doc_id"), "text", numMerges = 200,
      maxDocs = 200).toSeq
    assert(merges.nonEmpty)
    val stats = docs
      .select(
        size(TextFunctions.bpeTokens(col("text"), merges)).cast("long").as("bpe"),
        size(TextFunctions.normWords(col("text"))).cast("long").as("ws"),
        length(col("text")).cast("long").as("chars"))
      .agg(sum("bpe"), sum("ws"), sum("chars"))
      .as[(Long, Long, Long)].head()
    // real subword counts sit between words (every word >= 1 token) and
    // raw characters (merges only ever shrink the char segmentation)
    assert(stats._1 >= stats._2 && stats._1 <= stats._3,
      s"bpe=${stats._1} ws=${stats._2} chars=${stats._3}")
  }

  test("gate table: distinct+consistent, and in-order sequential replace == greedy encoder") {
    // the two properties the bpe_tokens SQL oracle stands on (the oracle
    // applies merges in TABLE ORDER as nested replace(); the encoder runs
    // the greedy lowest-rank loop — equal only for tables like this)
    val merges = graft.queries.TextQueries.bpeGateMerges
    val results = merges.map { case (a, b) => a + b }
    assert(results.distinct.size == results.size, "duplicate merge results")
    def isAtom(s: String) = {
      val core = s.stripSuffix(graft.functions.Bpe.EndOfWord)
      core.codePointCount(0, core.length) <= 1
    }
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val earlier = results.take(i).toSet
      assert((isAtom(a) || earlier(a)) && (isAtom(b) || earlier(b)),
        s"merge $i ($a, $b): operand is neither a codepoint nor an earlier result")
    }

    // sequential simulator: for each merge in order, replace all
    // occurrences left-to-right (the oracle's replace() semantics)
    def sequential(word: String): Vector[String] = {
      var syms = graft.functions.Bpe.symbols(word)
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val ranks = merges.zipWithIndex.toMap
    // every distinct word of the gate corpus + adversarial stress words
    val corpusWords = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(explode(graft.functions.TextFunctions.normWords(col("text"))).as("w"))
      .where(length(col("w")) > 0).distinct().as[String].collect()
    val stress = Seq("ststst", "aaat", "batchbatch", "stream", "customer",
      "colucolu", "erge", "merger", "parpar", "filtfilt")
    (corpusWords ++ stress).foreach { w =>
      assert(sequential(w) == graft.functions.Bpe.encode(w, ranks),
        s"sequential != greedy on '$w'")
    }
  }

  test("BpeTokens stays inside whole-stage codegen (instance-referenced kernel)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(20)
    val df = docs.select(
      TextFunctions.bpeTokens(col("text"), Seq(("t", "h"), ("th", "e</w>"))).as("toks"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("bpe_tokens")),
      s"bpe_tokens projection fell out of whole-stage codegen:\n$plan")
  }
}
