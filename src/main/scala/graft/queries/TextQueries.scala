package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Text-analysis / dedup / multimodal queries + DuckDB oracles
  * (SURVEY.md §2 #19-31) — all oracle-checked, including `dedup_simhash`
  * (md5-nibble bits; emitted as two positive 32-bit halves so bit 63 never
  * lands in BIGINT sign territory on either engine).
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  def langId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(docs(s, dir), "text")
      .select("doc_id", "lang", "score_en", "score_fr", "score_es",
              "score_de", "score_zh", "predicted_lang")
      .orderBy("doc_id")

  def quality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(docs(s, dir).drop("n_chars"), "text")
      .select("doc_id", "n_chars", "n_words", "avg_word_len", "alpha_ratio",
              "digit_ratio", "punct_ratio", "stopword_ratio", "quality_score")
      .orderBy("doc_id")

  def tokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(s, dir), "text")
      .select("doc_id", "ws_tokens", "re_tokens", "chars_per_token")
      .orderBy("doc_id")

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(docs(s, dir), "text")
      .select("doc_id", "fp", "mh0", "mh1", "mh2", "mh3")
      .orderBy("doc_id")

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), "doc_id", "text")
      .select("doc_id", "fp", "canonical_id", "group_size", "is_dup")
      .orderBy("doc_id")

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(docs(s, dir), "doc_id", "text")
      .orderBy("i", "j")

  def dedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(s, dir), "doc_id", "text", threshold = 0.5)
      .orderBy("i", "j")

  /** Containment pairs at 0.8: the planted near-dup families yield real
    * short-inside-long relations (truncated variants), and the df-capped
    * candidate join — NOT minhash bands — is what finds them.
    *
    * maxDf = 10 deliberately sits BELOW the sf0.1 corpus's max shingle df
    * (25), so the bench measures the DEPLOYMENT regime where the cap
    * prunes (candidates drop 1.13M → 0.44M at sf0.1, with every one of
    * the 256 result pairs retained — a contained pair is missed only when
    * its EVERY shared shingle is hotter than the cap, and none is until
    * maxDf < 10 here). The unpruned all-family-pairs regime stays covered
    * as the documented Stress datapoint (r8: sublinear growth with the cap
    * binding at 100k docs). */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainment(docs(s, dir), "doc_id", "text",
        threshold = 0.8, maxDf = 10)
      .orderBy("i", "j")

  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy("i", "j")

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"),
        shiftrightunsigned(col("simhash"), 32).as("simhash_hi"),
        col("simhash").bitwiseAND(lit(0xFFFFFFFFL)).as("simhash_lo"),
        col("n_tokens"))
      .orderBy("doc_id")

  def textClean(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.clean(docs(s, dir), "text")
      .select("doc_id", "n_urls", "n_emails", "clean_text")
      .orderBy("doc_id")

  def corpusStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusStats(docs(s, dir), "source", "text", "lang")
      .orderBy("source")

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(docs(s, dir), "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id")

  def corpusCurate(s: SparkSession, dir: String): DataFrame =
    Curate.curate(docs(s, dir), "doc_id", "text",
        minQuality = 0.5, lang = Some("en"), jaccardThreshold = 0.5)
      .orderBy("doc_id")

  def gopherQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherSignals(docs(s, dir), "text")
      .select("doc_id", "n_words", "n_lines", "mean_word_len",
        "dup_word_frac", "dup_line_frac", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_stop_hits", "gopher_keep")
      .orderBy("doc_id")

  /** PII redaction exercised on REAL redactable content: the corpus text
    * is augmented with deterministic doc_id-derived fake PII (email, phone,
    * IP, 16-digit account) that the oracle reproduces in SQL — so the gate
    * checks every redaction class actually fires, not just counts of
    * zero. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val aug = docs(s, dir).withColumn("aug_text",
      concat(col("text"),
        lit(" Contact user"), col("doc_id"), lit("@mail.example or +1 555-123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 acct "),
        lpad((col("doc_id") % 100000).cast("string"), 16, "9")))
    TextAnalysis.piiRedact(aug, "aug_text")
      .select("doc_id", "n_urls", "n_emails", "n_ips", "n_phones",
        "n_idnums", "redacted_text")
      .orderBy("doc_id")
  }

  /** Decontamination against an "eval set" carved deterministically out of
    * the corpus (every 50th doc): planted near-dups guarantee non-trivial
    * cross-doc overlap; self-pairs are excluded. n=3 (not the 8-13 grams
    * of production decontamination) because the synthetic docs are short —
    * the machinery under test is identical. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    CorpusOps.decontaminate(d, d.where(col("doc_id") % 50 === 0),
        "doc_id", "text", "doc_id", "text", n = 3, minOverlap = 2)
      .where(col("doc_id") =!= col("eval_id"))
      .orderBy("doc_id", "eval_id")
  }

  def corpusSample(s: SparkSession, dir: String): DataFrame =
    CorpusOps.stratifiedSample(docs(s, dir), "doc_id", "source",
        Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.0), defaultRate = 0.25)
      .select("doc_id", "source", "sample_bucket")
      .orderBy("doc_id")

  /** n=15 < the 25-docs-per-source gate corpus, so the cap cuts in EVERY
    * stratum (n above the stratum size would verify nothing). */
  def corpusTake(s: SparkSession, dir: String): DataFrame =
    CorpusOps.takeStratified(docs(s, dir), "doc_id", "source", n = 15)
      .select("doc_id", "source", "sample_rank")
      .orderBy("doc_id")

  def corpusSplit(s: SparkSession, dir: String): DataFrame =
    CorpusOps.splitCorpus(docs(s, dir), "doc_id",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split_bucket", "split")
      .orderBy("doc_id")

  def packShards(s: SparkSession, dir: String): DataFrame =
    CorpusOps.packShards(docs(s, dir), "doc_id", "text", "source",
        budgetTokens = 2000)
      .select("doc_id", "source", "n_tokens", "shard_id", "shard_offset")
      .orderBy("doc_id")

  def gopherTopgram(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topGramFraction(docs(s, dir), "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "top_count", "top_gram_frac")
      .orderBy("doc_id")

  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.binaryMeta(
        docs(s, dir).withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload")
      .orderBy("doc_id")

  private val mixWeights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  def mixturePlan(s: SparkSession, dir: String): DataFrame =
    CorpusOps.mixturePlan(docs(s, dir), "text", "source", mixWeights,
        budgetTokens = 2000)
      .orderBy("source")

  def corpusMixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    CorpusOps.mixtureSample(d, "doc_id", "source",
        CorpusOps.mixturePlan(d, "text", "source", mixWeights, budgetTokens = 2000))
      .select("doc_id", "source", "sample_bucket")
      .orderBy("doc_id")
  }

  def lmLogProb(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** CCNet head/middle/tail bucketing over the unigram-LM score, exact
    * (windowed) path — the approximate path is ScalaTest-checked against
    * this one (CcnetSpec). */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityBuckets(docs(s, dir), "doc_id", "text", "lang")
      .select("doc_id", "lang", "n_tokens", "avg_logprob",
        "bucket", "bucket_name")
      .orderBy("doc_id")

  /** Per-eval-sample contamination audit, eval carved as every 50th doc
    * (same carve as `decontaminate`); self-pairs excluded since the eval
    * set is a subset of the corpus. */
  def contaminationReport(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    CorpusOps.contaminationReport(d, d.where(col("doc_id") % 50 === 0),
        "doc_id", "text", "doc_id", "text", n = 3, minOverlap = 2,
        excludeSelf = true)
      .orderBy("eval_id")
  }

  /** Quality-weighted sampling driven by the literal classifier model:
    * keep-probability = round(lr score, 6) — rounded BEFORE thresholding
    * so a last-ulp sigmoid difference can't flip a boundary bucket. */
  def corpusWeighted(s: SparkSession, dir: String): DataFrame =
    CorpusOps.importanceSample(
        QualityClassifier.score(
            TextAnalysis.quality(docs(s, dir), "text"), lrModel)
          .select(col("doc_id"), round(col("lr_quality"), 6).as("weight")),
        "doc_id", "weight")
      .orderBy("doc_id")

  /** Unicode normalization over SQL-reproducible injected text: the
    * corpus is pure ASCII, so the gate appends a decomposed e+combining-
    * acute (NFC must compose it) and precomposed accented Latin (the
    * strip must fold it) — DuckDB's nfc_normalize/strip_accents agree
    * with the canonical-mark semantics on this range (probed; ø/æ/ß
    * style non-decomposables stay untouched on both engines). */
  def textUnicode(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      lit(" Caf"), lit("e\u0301"),
      lit(" se\u00f1or Z\u00fcrich \u00c0\u00c9\u00ce\u00d5\u00dc #"),
      col("doc_id"))
    docs(s, dir).select(col("doc_id"),
        graft.functions.TextFunctions.normalizeText(injected).as("norm_text"),
        graft.functions.TextFunctions.normalizeText(injected, stripAccents = true)
          .as("plain_text"))
      .orderBy("doc_id")
  }

  def corpusReport(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusReport(docs(s, dir), "doc_id", "text")
      .orderBy("metric")

  def lmBigram(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  def lmKn(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.knLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  def winnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id", "pos")

  /** LITERAL classifier model for the gate: the oracle re-derives the
    * exact sigmoid(w·standardize(x)+b) arithmetic in SQL, so scoring
    * parity is what this checks; `fit` determinism/accuracy is
    * QualityClassifierSpec's job (the ann_ivf split, but the scoring
    * half stays fully oracled). round(6) both sides absorbs exp()'s
    * 1-ulp platform latitude. */
  private val lrModel = QualityClassifier.Model(
    Seq("n_words", "avg_word_len", "alpha_ratio", "punct_ratio", "stopword_ratio"),
    means = Array(50.0, 4.5, 0.8, 0.02, 0.1),
    stds = Array(20.0, 1.0, 0.1, 0.02, 0.05),
    weights = Array(0.4, -0.3, 1.2, -1.5, 0.8),
    bias = 0.1)

  def qualityLr(s: SparkSession, dir: String): DataFrame =
    QualityClassifier.score(
        TextAnalysis.quality(docs(s, dir), "text"), lrModel)
      .select(col("doc_id"), round(col("lr_quality"), 6).as("lr_quality"))
      .orderBy("doc_id")

  /** Exact substring dedup at 12-token windows — small enough that the
    * planted near-dup structure (near-verbatim copies) yields real
    * duplicated runs at gate scale; the library default is the paper's
    * ~50. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dedupSubstrings(docs(s, dir), "doc_id", "text",
        windowTokens = 12, minCount = 2)
      .orderBy("doc_id")

  /** FROZEN 40-merge BPE table for the gate — trained ONCE by
    * `Bpe.trainOn` on the sf0.01 corpus (doc_id-ordered 200-doc sample,
    * the exact call the gate used to make at runtime) and committed as a
    * literal so the DuckDB oracle can re-apply the identical table.
    * Training itself stays covered by BpeSpec/TrainingMix.
    *
    * The table is DISTINCT-RESULT and CONSISTENT (every operand is a
    * single codepoint or an earlier merge's result — what real BPE
    * training always produces). That buys the oracle its core identity:
    * applying merges IN TABLE ORDER, each replacing all its occurrences
    * left-to-right, equals the encoder's greedy lowest-rank loop —
    * a later merge's result can never equal an earlier merge's operand
    * (it would duplicate an earlier result), so applying a later merge
    * never re-enables an earlier one. BpeSpec asserts both table
    * properties and the equivalence over the gate corpus. */
  private[graft] val bpeGateMerges: Seq[(String, String)] = Seq(
    "e" -> "r</w>", "o" -> "w</w>", "s" -> "t", "a" -> "t", "l" -> "u",
    "e" -> "r", "a" -> "s", "o" -> "r", "i" -> "n", "a" -> "r",
    "p" -> "ar", "f" -> "i", "fi" -> "l", "fil" -> "t", "filt" -> "er</w>",
    "at" -> "c", "atc" -> "h</w>", "b" -> "atch</w>", "a" -> "n</w>",
    "c" -> "an</w>", "s" -> "can</w>", "as" -> "h</w>", "h" -> "ash</w>",
    "c" -> "u", "cu" -> "st", "cust" -> "o", "custo" -> "m",
    "custom" -> "er</w>", "er" -> "g", "erg" -> "e</w>", "m" -> "erge</w>",
    "a" -> "m</w>", "e" -> "am</w>", "r" -> "eam</w>", "st" -> "ream</w>",
    "l" -> "ow</w>", "s" -> "low</w>", "u" -> "p</w>", "c" -> "o",
    "co" -> "lu")

  /** Real-subword token counts under [[bpeGateMerges]] (40 merges
    * against a ~31-word synthetic vocabulary: frequent words merge
    * fully, rare ones stay subword-split — so the bpe counts actually
    * DIFFER from whitespace counts at gate scale). Hash-oracled since
    * R17: DuckDB re-applies the frozen table per word as in-order
    * nested replace() over delimiter-wrapped symbols. */
  def bpeTokenCount(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val ws = graft.functions.TextFunctions.normWords(col("text"))
    d.select(col("doc_id"),
        graft.functions.TextFunctions.bpeTokens(col("text"),
          bpeGateMerges).as("_bpe"),
        filter(ws, w => length(w) > 0).as("_ws"))
      .select(col("doc_id"),
        coalesce(size(col("_bpe")), lit(0)).cast("long").as("n_bpe_tokens"),
        coalesce(size(col("_ws")), lit(0)).cast("long").as("n_ws_tokens"))
      .orderBy("doc_id")
  }

  /** The [[bpeGateMerges]] encoder re-derived in DuckDB: each word's
    * codepoints wrap in chr(1)/chr(2) delimiters (never in the corpus;
    * token-boundary-safe — a pattern can't match inside a multi-char
    * symbol), the last symbol takes the `</w>` marker, then the merges
    * apply as NESTED in-order replace() calls (all occurrences, left to
    * right — replace()'s own semantics). Token count = delimiter count. */
  private def bpeOracle: String = {
    def q(str: String) = str.replace("'", "''")
    val init = "regexp_replace(regexp_replace(w, '(.)', " +
      "chr(1) || '\\1' || chr(2), 'g'), chr(2) || '$', '</w>' || chr(2))"
    val folded = bpeGateMerges.foldLeft(init) { case (e, (a, b)) =>
      s"replace($e, chr(1) || '${q(a)}' || chr(2) || chr(1) || '${q(b)}' " +
        s"|| chr(2), chr(1) || '${q(a + b)}' || chr(2))"
    }
    s"""WITH w AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
       |    x -> x <> '')) AS w
       |  FROM documents),
       |e AS (SELECT doc_id, $folded AS enc FROM w),
       |c AS (SELECT doc_id,
       |        sum(length(enc) - length(replace(enc, chr(1), ''))) AS n_bpe,
       |        count(*) AS n_ws
       |      FROM e GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(c.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
       |  CAST(coalesce(c.n_ws, 0) AS BIGINT) AS n_ws_tokens
       |FROM documents d LEFT JOIN c USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Synthesized per-doc URLs (the corpus has no URL column — the
    * pii_redact augmentation convention, SQL-reproducible): six variants
    * exercising every canonicalization rule — case, default vs
    * load-bearing ports, www, fragments, tracking params, param order,
    * trailing slashes, bare hosts. */
  private def synthUrl: org.apache.spark.sql.Column = {
    val v = pmod(col("doc_id"), lit(6))
    when(v === 0, lit("HTTP://WWW.Example.COM:80/path/?utm_source=x&b=2&a=1#frag"))
      .when(v === 1, lit("https://News.Site.org:443/a/b/"))
      .when(v === 2, concat(lit("http://example.com/page"), col("doc_id"),
        lit("?gclid=123&id="), col("doc_id")))
      .when(v === 3, lit("https://example.com:8443/x?z=1&y=2"))
      .when(v === 4, concat(lit("http://www.blog.net/p/"), col("doc_id")))
      .otherwise(lit("https://example.com"))
  }

  def urlCanon(s: SparkSession, dir: String): DataFrame =
    UrlOps.canonicalize(
        docs(s, dir).select(col("doc_id"), synthUrl.as("url")), "url")
      .select("doc_id", "url", "canonical_url", "host")
      .orderBy("doc_id")

  def urlHostStats(s: SparkSession, dir: String): DataFrame =
    UrlOps.hostStats(docs(s, dir).select(col("doc_id"), synthUrl.as("url")), "url")
      .orderBy("host")

  /** Exact per-host cap at 50: every synthesized host is over the cap at
    * gate scale, so the window actually cuts. */
  def urlHostCap(s: SparkSession, dir: String): DataFrame =
    UrlOps.hostCap(docs(s, dir).select(col("doc_id"), synthUrl.as("url")),
        "doc_id", "url", cap = 50)
      .select("doc_id", "host", "host_rank")
      .orderBy("doc_id")

  /** APPROXIMATE per-host cap at 50 — the mega-host deployment shape
    * (`exact = false`): per-host census broadcast + map-side md5-bucket
    * threshold at rate cap/n, NO window anywhere. Survivor counts are
    * binomial around the cap, but the kept SET is fully deterministic
    * given the hash rule — the same engine-portable hex-threshold
    * convention as `corpus_sample`/`corpus_mixture`, so DuckDB re-derives
    * it exactly. `host_rank` is a typed null (schema parity with the
    * exact path; rank is unknowable without the window this path avoids). */
  def urlHostCapApprox(s: SparkSession, dir: String): DataFrame =
    UrlOps.hostCap(docs(s, dir).select(col("doc_id"), synthUrl.as("url")),
        "doc_id", "url", cap = 50, exact = false)
      .select("doc_id", "host", "host_rank")
      .orderBy("doc_id")

  // Fingerprint-store cache per (session, corpus): history is
  // fingerprinted ONCE when it lands (the DedupStore contract); the gate
  // query then times/checks only the incremental probe — same convention
  // as SimilarityQueries.ivfIndex.
  private val fpStores =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  /** The one definition of the gate's shard split + store bootstrap:
    * history (doc_id % 5 != 0) is fingerprinted ONCE per (session,
    * corpus) and persisted; both incremental gate queries probe the SAME
    * store, so the split and layout can never drift between them. */
  private def storeFor(s: SparkSession, dir: String): String =
    fpStores.getOrElseUpdate((s, dir), {
      val p = java.nio.file.Files.createTempDirectory("graft-fp-store").toString
      graft.operators.DedupStore.save(
        docs(s, dir).where(col("doc_id") % 5 =!= 0), "doc_id", "text", p)
      p
    })

  /** Incremental dedup: docs with doc_id % 5 == 0 are "the new shard",
    * the rest are history persisted as a band store. Oracle = the full
    * batch candidate set restricted to pairs touching the shard —
    * md5-determinism makes the incremental path value-identical. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.DedupStore.incrementalCandidates(
        d.where(col("doc_id") % 5 === 0), "doc_id", "text",
        graft.operators.DedupStore.load(s, storeFor(s, dir)))
      .orderBy("i", "j")
  }

  // Bloom prefilter bytes per (session, corpus) — built once alongside the
  // store it summarizes, the production lifecycle (snapshot lands → store
  // written → bloom built).
  private val fpBlooms =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Byte]]

  /** Bloom-prefiltered twin of [[dedupIncremental]] — same store, same
    * shard, and (Bloom filters have no false negatives) value-IDENTICAL
    * output: the oracle is literally `dedup_incremental`'s SQL. What the
    * gate adds is end-to-end proof that the native `bloom_might_contain`
    * prefilter drops shard band rows without losing a single candidate. */
  def dedupIncrementalBloom(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val store = graft.operators.DedupStore.load(s, storeFor(s, dir))
    val bloom = fpBlooms.getOrElseUpdate((s, dir),
      graft.operators.DedupStore.bloomOf(store,
        expectedItems = math.max(store.count(), 1L)))
    graft.operators.DedupStore.incrementalCandidatesBloom(
        d.where(col("doc_id") % 5 === 0), "doc_id", "text", store, bloom)
      .orderBy("i", "j")
  }

  def tfidfTop(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(docs(s, dir), "doc_id", "text", k = 5)
      .orderBy("doc_id", "rank")

  def bm25Top(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopTerms(docs(s, dir), "doc_id", "text", k = 5)
      .orderBy("doc_id", "rank")

  /** Weighted exactly-20-per-source carve, weight = document length
    * (n_chars) — longer docs proportionally likelier, selection
    * md5-deterministic (A-ES). */
  def corpusTakeWeighted(s: SparkSession, dir: String): DataFrame =
    CorpusOps.takeWeighted(
        docs(s, dir).select(col("doc_id"), col("source"),
          col("n_chars").cast("double").as("w")),
        "doc_id", "source", "w", n = 20)
      .select("doc_id", "source", "sample_rank")
      .orderBy("doc_id")

  /** HTML extraction exercised on REAL markup: the corpus text is wrapped
    * in a deterministic page (style + script blocks whose CONTENT must
    * vanish, nested tags, the entity set incl. the `&amp;lt;`-ordering
    * case) that the oracle reproduces — every rule fires on every row. */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    val aug = docs(s, dir).withColumn("html", concat(
      lit("<html><head><style>p{color:red}</style><script type=\"text/js\">var x"),
      col("doc_id"),
      lit(";</script></head><body><p class=\"main\">"),
      col("text"),
      lit("</p><div>Tom &amp; Jerry &lt;3&nbsp;wins &amp;lt;sometimes&amp;gt;</div></body></html>")))
    TextAnalysis.htmlExtract(aug, "html")
      .select("doc_id", "n_scripts", "n_tags", "extracted_text")
      .orderBy("doc_id")
  }

  /** Token chunking at 40 tokens / 8 overlap — sized so gate docs split
    * into several chunks and the short-tail rule fires. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocs(docs(s, dir), "doc_id", "text",
        chunkTokens = 40, overlap = 8)
      .orderBy("doc_id", "chunk_id")

  /** Line dedup over SYNTHESIZED lines: the corpus texts carry no
    * newlines, so the gate re-lines each document deterministically (8
    * normalized words per line — reproducible in SQL, like pii_redact's
    * augmentation); the planted near-dup structure then yields real
    * cross-document boilerplate lines for [[TextAnalysis.dedupLines]] to
    * strip. */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val ws = graft.functions.TextFunctions.normWords(col("text"))
    val lined = docs(s, dir).select(col("doc_id"),
      concat_ws("\n", transform(
        sequence(lit(0L), floor((size(ws) - lit(1)) / lit(8.0)).cast("long")),
        i => concat_ws(" ", slice(ws, (i * lit(8L) + lit(1L)).cast("int"), lit(8)))))
        .as("text"))
    TextAnalysis.dedupLines(lined, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")
  }

  /** Repetition signals over synthesized lines (the [[lineDedup]]
    * re-lining), with every third line ECHOED at the end of its document
    * so the within-doc duplicate fractions actually bite at gate scale
    * (the corpus texts repeat across docs, rarely within one). */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val ws = graft.functions.TextFunctions.normWords(col("text"))
    val lineArr = transform(
      sequence(lit(0L), floor((size(ws) - lit(1)) / lit(8.0)).cast("long")),
      i => concat_ws(" ", slice(ws, (i * lit(8L) + lit(1L)).cast("int"), lit(8))))
    val echoed = concat(lineArr,
      filter(lineArr, (_, i) => i % lit(3) === lit(0)))
    val lined = docs(s, dir).select(col("doc_id"),
      concat_ws("\n", echoed).as("text"))
    TextAnalysis.repetitionSignals(lined, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Duplicate-5-gram char fraction with each doc's FIRST 16 words echoed
    * verbatim at its end — every ≥16-word doc then carries real within-doc
    * duplicated 5-grams (the corpus repeats across docs, rarely within
    * one), so the fraction bites at gate scale. */
  def textDupNgrams(s: SparkSession, dir: String): DataFrame = {
    val ws = graft.functions.TextFunctions.normWords(col("text"))
    val echoed = docs(s, dir).select(col("doc_id"),
      concat_ws(" ", concat(ws, slice(ws, 1, 16))).as("text"))
    TextAnalysis.dupNgramStats(echoed, "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  /** C4 cleaning over synthesized lines: 8-word re-lining with a period
    * appended to every EVEN-indexed line (so the terminal-punctuation
    * rule cuts the odd ones), a `lorem ipsum` tail on doc_id % 17 == 0
    * and a braced tail on % 23 == 0 (page-level drops bite
    * deterministically; the % 17 case wins when both divide). */
  def textC4(s: SparkSession, dir: String): DataFrame = {
    val ws = graft.functions.TextFunctions.normWords(col("text"))
    val lineArr = transform(
      sequence(lit(0L), floor((size(ws) - lit(1)) / lit(8.0)).cast("long")),
      i => concat_ws(" ", slice(ws, (i * lit(8L) + lit(1L)).cast("int"), lit(8))))
    val punct = transform(lineArr,
      (l, i) => when(i % 2 === 0, concat(l, lit("."))).otherwise(l))
    val base = concat_ws("\n", punct)
    val text = when(col("doc_id") % 17 === 0,
        concat(base, lit("\nlorem ipsum dolor sit amet.")))
      .when(col("doc_id") % 23 === 0,
        concat(base, lit("\nfunction() { return 1; }")))
      .otherwise(base)
    TextAnalysis.c4Clean(
        docs(s, dir).select(col("doc_id"), text.as("text")), "doc_id", "text")
      .select("doc_id", "c4_lines_kept", "c4_lines_removed", "c4_page_keep",
        "clean_text")
      .orderBy("doc_id")
  }

  /** Keep-first dedup verdicts for the same shard split as
    * [[dedupIncremental]]: dup iff a ≥0.75-est candidate counterpart is
    * in history or earlier in the shard. */
  def dedupIncrVerdicts(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.DedupStore.incrementalVerdicts(
        d.where(col("doc_id") % 5 === 0), "doc_id", "text",
        graft.operators.DedupStore.load(s, storeFor(s, dir)), threshold = 0.75)
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lang_id" -> (langId _),
    "text_quality" -> (quality _),
    "token_count" -> (tokenCount _),
    "doc_fingerprint" -> (fingerprint _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_clusters" -> (dedupClusters _),
    "text_clean" -> (textClean _),
    "corpus_stats" -> (corpusStats _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_simhash_pairs" -> (dedupSimhashPairs _),
    "corpus_curate" -> (corpusCurate _),
    "gopher_quality" -> (gopherQuality _),
    "gopher_topgram" -> (gopherTopgram _),
    "pii_redact" -> (piiRedact _),
    "decontaminate" -> (decontaminate _),
    "corpus_sample" -> (corpusSample _),
    "corpus_split" -> (corpusSplit _),
    "corpus_take" -> (corpusTake _),
    "corpus_take_weighted" -> (corpusTakeWeighted _),
    "chunk_docs" -> (chunkDocs _),
    "html_extract" -> (htmlExtract _),
    "pack_shards" -> (packShards _),
    "multimodal_meta" -> (multimodalMeta _),
    "tfidf_topterms" -> (tfidfTop _),
    "bm25_topterms" -> (bm25Top _),
    "line_dedup" -> (lineDedup _),
    "text_repetition" -> (textRepetition _),
    "text_dup_ngrams" -> (textDupNgrams _),
    "text_c4" -> (textC4 _),
    "mixture_plan" -> (mixturePlan _),
    "corpus_mixture" -> (corpusMixture _),
    "lm_logprob" -> (lmLogProb _),
    "lm_bigram" -> (lmBigram _),
    "lm_kn" -> (lmKn _),
    "fingerprint_winnow" -> (winnow _),
    "ccnet_buckets" -> (ccnetBuckets _),
    "contamination_report" -> (contaminationReport _),
    "quality_lr" -> (qualityLr _),
    "corpus_weighted" -> (corpusWeighted _),
    "corpus_report" -> (corpusReport _),
    "text_unicode" -> (textUnicode _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_incr_bloom" -> (dedupIncrementalBloom _),
    "dedup_incr_verdicts" -> (dedupIncrVerdicts _),
    "bpe_tokens" -> (bpeTokenCount _),
    "url_canon" -> (urlCanon _),
    "url_host_stats" -> (urlHostStats _),
    "url_host_cap" -> (urlHostCap _),
    "url_host_cap_approx" -> (urlHostCapApprox _)
  )

  /** URL canonicalization re-derived in SQL (same regex rules as
    * `UrlOps`): synthesized urls → scheme/host/path/query parts → canon. */
  private val urlCtes =
    """u AS (SELECT doc_id,
      |    CASE doc_id % 6
      |      WHEN 0 THEN 'HTTP://WWW.Example.COM:80/path/?utm_source=x&b=2&a=1#frag'
      |      WHEN 1 THEN 'https://News.Site.org:443/a/b/'
      |      WHEN 2 THEN 'http://example.com/page' || doc_id || '?gclid=123&id=' || doc_id
      |      WHEN 3 THEN 'https://example.com:8443/x?z=1&y=2'
      |      WHEN 4 THEN 'http://www.blog.net/p/' || doc_id
      |      ELSE 'https://example.com' END AS url
      |  FROM documents),
      | parts AS (SELECT doc_id, url,
      |    lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(regexp_extract(trim(url), '^([^#?]*)', 1),
      |                   '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
      |    regexp_extract(trim(url), '^[^#?]*\?([^#]*)', 1) AS query
      |  FROM u),
      | hostp AS (SELECT *,
      |    regexp_replace(lower(regexp_extract(rest, '^([^/]*)', 1)), '^www\.', '') AS host_nw,
      |    regexp_replace(regexp_extract(rest, '^[^/]*(.*)$', 1), '/+$', '') AS path
      |  FROM parts),
      | hosted AS (SELECT *,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(host_nw, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(host_nw, ':443$', '')
      |         ELSE host_nw END AS host
      |  FROM hostp),
      | canon AS (SELECT doc_id, url, host,
      |    scheme || '://' || host || path ||
      |      CASE WHEN params = '' THEN '' ELSE '?' || params END AS canonical_url
      |  FROM (SELECT *, coalesce(array_to_string(list_sort(
      |          [p for p in string_split(query, '&')
      |           if p <> '' and not regexp_matches(p, '^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$')]),
      |          '&'), '') AS params
      |        FROM hosted))""".stripMargin

  private def markersIn(lang: String): String =
    TextAnalysis.markers(lang).map(m => s"'$m'").mkString("(", ", ", ")")

  /** Shared doc-words CTE. NOTE DuckDB regexp_replace needs the 'g' flag. */
  private val wordsSql =
    """w AS (SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS ws
      |       FROM documents)""".stripMargin

  /** Dedup-side tokenization: normalized text (lowercase, collapsed
    * whitespace), matching TextFunctions.normWords. Parameterized by the
    * source relation so composed pipelines (corpus_curate) can shingle a
    * FILTERED corpus. */
  private def normWordsFrom(src: String): String =
    s"""nw AS (SELECT doc_id,
       |  string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM $src)""".stripMargin

  private val shOnlySql =
    """sh AS (SELECT doc_id,
      |  list_distinct([array_to_string(ws[x:x+2], ' ') for x in generate_series(1, len(ws)-2)]) AS s
      |  FROM nw WHERE len(ws) >= 3)""".stripMargin

  private val shinglesSql = normWordsFrom("documents") + ",\n" + shOnlySql

  private val sigsSql =
    """sigs AS (SELECT doc_id,
      |  [list_min([md5(CAST(k AS VARCHAR) || '|' || x) for x in s]) for k in generate_series(0, 11)] AS sig
      |  FROM sh WHERE len(s) > 0)""".stripMargin

  private val candSql =
    """bands AS (
      |  SELECT doc_id, b, md5(sig[3*b+1] || sig[3*b+2] || sig[3*b+3]) AS bh
      |  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
      |  FROM bands a JOIN bands c ON a.b = c.b AND a.bh = c.bh AND a.doc_id < c.doc_id)""".stripMargin

  /** Shared SimHash re-derivation CTEs: md5-nibble bits (bit `i` = bit
    * `(i%4)` of hex nibble `i/4` of `md5(token)`), majority vote per doc —
    * 64 generated bit-sums ending in an `agg(doc_id, n, s0..s63)` CTE. */
  private def simhashCtes: String = {
    def bitSum(i: Int) = {
      val pos = i / 4 + 1
      val j = i % 4
      "sum(CASE WHEN (((strpos('0123456789abcdef', substr(h, " + pos + ", 1)) - 1) >> " +
        j + ") & 1) = 1 THEN 1 ELSE 0 END) AS s" + i
    }
    val sums = (0 until 64).map(bitSum).mkString(",\n  ")
    s"""nw AS (SELECT doc_id,
       |  string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents),
       |tok AS (SELECT doc_id, md5(w) AS h
       |        FROM (SELECT doc_id, unnest(ws) AS w FROM nw)),
       |agg AS (SELECT doc_id, count(*) AS n,
       |  $sums
       |  FROM tok GROUP BY doc_id)""".stripMargin
  }

  /** One positive 32-bit half of the majority-vote signature (`lo` = 0 or
    * 32) — keeps bit 63 out of BIGINT sign territory on either engine. */
  private def simhashHalf(lo: Int): String =
    (lo until lo + 32).map(i => s"(CASE WHEN 2 * s$i > n THEN ${1L << (i - lo)} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)")

  private def simhashOracle: String =
    s"""WITH $simhashCtes
       |SELECT doc_id,
       |  ${simhashHalf(32)} AS simhash_hi,
       |  ${simhashHalf(0)} AS simhash_lo,
       |  CAST(n AS BIGINT) AS n_tokens
       |FROM agg ORDER BY doc_id""".stripMargin

  /** `dedup_simhash_pairs` oracle: same signature derivation, banded into
    * four 16-bit buckets (from the hi/lo halves), bucket self-join, exact
    * Hamming rescore as bit_count(xor) per half. */
  private def simhashPairsOracle: String =
    s"""WITH $simhashCtes,
       |sh AS (SELECT doc_id, ${simhashHalf(32)} AS hi, ${simhashHalf(0)} AS lo FROM agg),
       |bands AS (
       |  SELECT doc_id, hi, lo, 0 AS band, lo & 65535 AS bits FROM sh
       |  UNION ALL SELECT doc_id, hi, lo, 1, (lo >> 16) & 65535 FROM sh
       |  UNION ALL SELECT doc_id, hi, lo, 2, hi & 65535 FROM sh
       |  UNION ALL SELECT doc_id, hi, lo, 3, (hi >> 16) & 65535 FROM sh),
       |cand AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j,
       |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS ham
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
       |SELECT i, j, CAST(min(ham) AS INT) AS hamming FROM cand
       |WHERE ham <= 3 GROUP BY i, j ORDER BY i, j""".stripMargin

  /** `corpus_curate` oracle: the whole curation chain re-derived in SQL —
    * quality + language flags, exact dedup over the survivors, MinHash →
    * n-gram → recursive-CTE clustering over THOSE survivors, one verdict
    * row per input doc with the same reason precedence as the operator. */
  private def curateOracle: String = {
    val langs = Seq("en", "fr", "es", "de", "zh")
    val scoreCols = langs.map(l =>
      s"len(list_filter(ws, x -> x IN ${markersIn(l)})) AS s_$l").mkString(",\n    ")
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val predicted = langs.foldRight("'und'") { (l, alt) =>
      s"CASE WHEN $best > 0 AND s_$l = $best THEN '$l' ELSE $alt END"
    }
    s"""WITH RECURSIVE
       |bw AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS ws
       |       FROM documents),
       |scored AS (SELECT doc_id, text,
       |    (CASE WHEN len(ws) >= 5 THEN 1.0 ELSE 0.0 END)
       |      * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text))
       |      * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)) AS q,
       |    $scoreCols
       |  FROM bw),
       |flags AS (SELECT doc_id, text,
       |    coalesce(q, -1.0) < 0.5 AS lowq,
       |    ($predicted) <> 'en' AS wlang
       |  FROM scored),
       |passed AS (SELECT doc_id, text FROM flags WHERE NOT lowq AND NOT wlang),
       |ex AS (SELECT doc_id,
       |    min(doc_id) OVER (PARTITION BY
       |      md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS ex_canon
       |  FROM passed),
       |exsurv AS (SELECT p.doc_id, p.text FROM passed p JOIN ex ON p.doc_id = ex.doc_id
       |           WHERE ex.doc_id = ex.ex_canon),
       |${normWordsFrom("exsurv")},
       |$shOnlySql,
       |$sigsSql,
       |$candSql,
       |verified AS (
       |  SELECT i, j FROM (
       |    SELECT cand.i, cand.j,
       |      CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jac
       |    FROM cand JOIN sh sa ON cand.i = sa.doc_id JOIN sh sb ON cand.j = sb.doc_id)
       |  WHERE jac >= 0.5),
       |edges AS (SELECT i, j FROM verified UNION ALL SELECT j, i FROM verified),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM exsurv
       |  UNION
       |  SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i),
       |clus AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
       |verdict AS (SELECT f.doc_id,
       |    CASE WHEN f.lowq THEN 'low_quality'
       |         WHEN f.wlang THEN 'wrong_language'
       |         WHEN ex.doc_id IS NOT NULL AND ex.doc_id <> ex.ex_canon THEN 'exact_duplicate'
       |         WHEN clus.cluster_id IS NOT NULL AND clus.cluster_id <> f.doc_id THEN 'near_duplicate'
       |         ELSE 'kept' END AS reason,
       |    coalesce(cx.cluster_id, ex.ex_canon) AS ex_canon_final, clus.cluster_id
       |  FROM flags f
       |  LEFT JOIN ex ON f.doc_id = ex.doc_id
       |  LEFT JOIN clus ON f.doc_id = clus.doc_id
       |  LEFT JOIN clus cx ON ex.ex_canon = cx.doc_id)
       |SELECT doc_id, reason = 'kept' AS kept, reason,
       |  CASE WHEN reason = 'exact_duplicate' THEN ex_canon_final
       |       WHEN reason = 'near_duplicate' THEN cluster_id
       |       WHEN reason = 'kept' THEN doc_id END AS canonical_id
       |FROM verdict ORDER BY doc_id""".stripMargin
  }

  private lazy val dedupIncrementalOracle: String =
    s"""WITH $wordsSql,
       |$shinglesSql,
       |$sigsSql,
       |$candSql
       |SELECT cand.i, cand.j,
       |  CAST(list_sum([CASE WHEN a.sig[k] = b.sig[k] THEN 1 ELSE 0 END
       |                 for k in generate_series(1, 12)]) AS DOUBLE) / 12 AS est_sim
       |FROM cand JOIN sigs a ON cand.i = a.doc_id JOIN sigs b ON cand.j = b.doc_id
       |WHERE cand.i % 5 = 0 OR cand.j % 5 = 0
       |ORDER BY i, j""".stripMargin

  val oracle: Map[String, String] = Map(
    "bpe_tokens" -> bpeOracle,
    "dedup_simhash" -> simhashOracle,
    "dedup_simhash_pairs" -> simhashPairsOracle,
    "corpus_curate" -> curateOracle,
    "lang_id" ->
      s"""WITH $wordsSql,
         |scored AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(ws, x -> x IN ${markersIn("en")})) AS INT) AS score_en,
         |  CAST(len(list_filter(ws, x -> x IN ${markersIn("fr")})) AS INT) AS score_fr,
         |  CAST(len(list_filter(ws, x -> x IN ${markersIn("es")})) AS INT) AS score_es,
         |  CAST(len(list_filter(ws, x -> x IN ${markersIn("de")})) AS INT) AS score_de,
         |  CAST(len(list_filter(ws, x -> x IN ${markersIn("zh")})) AS INT) AS score_zh
         |  FROM w)
         |SELECT doc_id, lang, score_en, score_fr, score_es, score_de, score_zh,
         |  CASE WHEN greatest(score_en, score_fr, score_es, score_de, score_zh) = 0 THEN 'und'
         |       WHEN score_en = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'en'
         |       WHEN score_fr = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'fr'
         |       WHEN score_es = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'es'
         |       WHEN score_de = greatest(score_en, score_fr, score_es, score_de, score_zh) THEN 'de'
         |       ELSE 'zh' END AS predicted_lang
         |FROM scored ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH $wordsSql
         |SELECT doc_id,
         |  CAST(length(text) AS INT) AS n_chars,
         |  CAST(len(ws) AS INT) AS n_words,
         |  CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws) AS avg_word_len,
         |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
         |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
         |  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |  CAST(len(list_filter(ws, x -> x IN ${markersIn("en")})) AS DOUBLE) / len(ws) AS stopword_ratio,
         |  (CASE WHEN len(ws) >= 5 THEN 1.0 ELSE 0.0 END)
         |    * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text))
         |    * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)) AS quality_score
         |FROM w ORDER BY doc_id""".stripMargin,

    "token_count" ->
      s"""WITH $wordsSql
         |SELECT doc_id,
         |  CAST(len(ws) AS INT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS re_tokens,
         |  CAST(length(text) AS DOUBLE)
         |    / len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS chars_per_token
         |FROM w ORDER BY doc_id""".stripMargin,

    "doc_fingerprint" ->
      s"""WITH $wordsSql,
         |$shinglesSql
         |SELECT w.doc_id,
         |  md5(lower(trim(regexp_replace(w.text, '\\s+', ' ', 'g')))) AS fp,
         |  list_min([md5('0|' || x) for x in sh.s]) AS mh0,
         |  list_min([md5('1|' || x) for x in sh.s]) AS mh1,
         |  list_min([md5('2|' || x) for x in sh.s]) AS mh2,
         |  list_min([md5('3|' || x) for x in sh.s]) AS mh3
         |FROM w LEFT JOIN sh ON w.doc_id = sh.doc_id
         |ORDER BY w.doc_id""".stripMargin,

    "dedup_exact" ->
      """WITH f AS (SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents)
        |SELECT doc_id, fp,
        |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
        |  count(*) OVER (PARTITION BY fp) AS group_size,
        |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
        |FROM f ORDER BY doc_id""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $wordsSql,
         |$shinglesSql,
         |$sigsSql,
         |$candSql
         |SELECT cand.i, cand.j,
         |  CAST(list_sum([CASE WHEN a.sig[k] = b.sig[k] THEN 1 ELSE 0 END
         |                 for k in generate_series(1, 12)]) AS DOUBLE) / 12 AS est_sim
         |FROM cand JOIN sigs a ON cand.i = a.doc_id JOIN sigs b ON cand.j = b.doc_id
         |ORDER BY i, j""".stripMargin,

    // the full-batch candidate set restricted to pairs touching the "new
    // shard" (doc_id % 5 = 0) — exactly what the incremental path reports
    // (new×new self-join + new×history store join; history×history never
    // forms on either side)
    "dedup_incremental" -> dedupIncrementalOracle,
    // the bloom prefilter is output-invariant (no false negatives), so the
    // bloom gate's oracle IS the incremental oracle — that identity is the
    // property under test
    "dedup_incr_bloom" -> dedupIncrementalOracle,

    // keep-first verdicts re-derived from the same candidate set: orient
    // each qualifying pair toward the shard doc, counterpart qualifies if
    // in history (doc_id % 5 <> 0) or earlier in the shard
    "dedup_incr_verdicts" ->
      s"""WITH $wordsSql,
         |$shinglesSql,
         |$sigsSql,
         |$candSql,
         | candE AS (SELECT cand.i, cand.j,
         |    CAST(list_sum([CASE WHEN a.sig[k] = b.sig[k] THEN 1 ELSE 0 END
         |                   for k in generate_series(1, 12)]) AS DOUBLE) / 12 AS est
         |  FROM cand JOIN sigs a ON cand.i = a.doc_id
         |            JOIN sigs b ON cand.j = b.doc_id),
         | orient AS (SELECT i AS doc, j AS other, est FROM candE
         |            UNION ALL SELECT j, i, est FROM candE),
         | q AS (SELECT doc, min(other) AS dup_of, max(est) AS best_sim
         |   FROM orient
         |   WHERE doc % 5 = 0 AND est >= 0.75
         |     AND (other % 5 <> 0 OR other < doc)
         |   GROUP BY doc)
         |SELECT d.doc_id, q.dup_of, q.best_sim,
         |  q.dup_of IS NOT NULL AS is_dup
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN q ON d.doc_id = q.doc
         |ORDER BY d.doc_id""".stripMargin,

    "dedup_ngram" ->
      s"""WITH $wordsSql,
         |$shinglesSql,
         |$sigsSql,
         |$candSql
         |SELECT i, j, jaccard FROM (
         |  SELECT cand.i, cand.j,
         |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
         |  FROM cand JOIN sh sa ON cand.i = sa.doc_id JOIN sh sb ON cand.j = sb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY i, j""".stripMargin,

    // containment candidates from the df-capped rare-shingle join (NOT the
    // minhash bands — band collisions track Jaccard, which containment
    // pairs lack by construction), exact rescore, both directions
    "dedup_containment" ->
      s"""WITH ${normWordsFrom("documents")},
         |$shOnlySql,
         | g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
         | rare AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 10),
         | rg AS (SELECT g.doc_id, g.gram FROM g JOIN rare USING (gram)),
         | cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |   FROM rg a JOIN rg b ON a.gram = b.gram AND a.doc_id < b.doc_id)
         |SELECT i, j, containment_i, containment_j FROM (
         |  SELECT cand.i, cand.j,
         |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / len(sa.s)
         |      AS containment_i,
         |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / len(sb.s)
         |      AS containment_j
         |  FROM cand JOIN sh sa ON cand.i = sa.doc_id
         |            JOIN sh sb ON cand.j = sb.doc_id)
         |WHERE greatest(containment_i, containment_j) >= 0.8
         |ORDER BY i, j""".stripMargin,

    "text_clean" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INT) AS n_emails,
        |  trim(regexp_replace(
        |    regexp_replace(regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
        |                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '\s+', ' ', 'g')) AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "corpus_stats" ->
      """SELECT source,
        |  count(*) AS n_docs,
        |  CAST(min(length(text)) AS INT) AS min_chars,
        |  CAST(max(length(text)) AS INT) AS max_chars,
        |  avg(length(text)) AS avg_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_unique_texts
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $wordsSql,
         |$shinglesSql,
         |$sigsSql,
         |$candSql,
         |verified AS (
         |  SELECT i, j FROM (
         |    SELECT cand.i, cand.j,
         |      CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         |        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jac
         |    FROM cand JOIN sh sa ON cand.i = sa.doc_id JOIN sh sb ON cand.j = sb.doc_id)
         |  WHERE jac >= 0.5),
         |edges AS (SELECT i, j FROM verified UNION ALL SELECT j, i FROM verified),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.j FROM reach r JOIN edges e ON r.b = e.i)
         |SELECT a AS doc_id, min(b) AS cluster_id, a = min(b) AS is_canonical
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
        |  md5(text) AS content_hash,
        |  upper(hex(CAST(substr(text, 1, 4) AS BLOB))) AS magic_hex,
        |  CASE WHEN upper(hex(CAST(substr(text, 1, 3) AS BLOB))) = 'FFD8FF' THEN 'jpeg'
        |       WHEN upper(hex(CAST(substr(text, 1, 4) AS BLOB))) = '89504E47' THEN 'png'
        |       WHEN substr(text, 1, 4) = 'RIFF' THEN 'riff'
        |       ELSE 'unknown' END AS sniffed_kind
        |FROM documents ORDER BY doc_id""".stripMargin,

    "gopher_quality" ->
      s"""WITH $wordsSql,
         | d AS (SELECT doc_id, text, ws,
         |         [lower(x) for x in ws] AS lw,
         |         list_filter([trim(x) for x in string_split(text, chr(10))],
         |                     x -> length(x) > 0) AS lines
         |       FROM w),
         | sig AS (SELECT doc_id,
         |   CAST(len(ws) AS INT) AS n_words,
         |   CAST(len(lines) AS INT) AS n_lines,
         |   CASE WHEN len(ws) = 0 THEN NULL ELSE
         |     CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws) END
         |     AS mean_word_len,
         |   CASE WHEN len(ws) = 0 THEN NULL ELSE
         |     1.0 - CAST(len(list_distinct(lw)) AS DOUBLE) / len(ws) END
         |     AS dup_word_frac,
         |   CASE WHEN len(lines) = 0 THEN NULL ELSE
         |     1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) END
         |     AS dup_line_frac,
         |   CASE WHEN len(ws) = 0 THEN NULL ELSE
         |     CAST(length(text) - length(replace(text, '#', ''))
         |          + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
         |       / len(ws) END AS symbol_word_ratio,
         |   CASE WHEN len(lines) = 0 THEN NULL ELSE
         |     CAST(len(list_filter(lines, x -> substr(x, 1, 1) IN ('-', '*', '•')))
         |          AS DOUBLE) / len(lines) END AS bullet_line_frac,
         |   CASE WHEN len(lines) = 0 THEN NULL ELSE
         |     CAST(len(list_filter(lines, x -> x LIKE '%...')) AS DOUBLE)
         |       / len(lines) END AS ellipsis_line_frac,
         |   CASE WHEN len(ws) = 0 THEN NULL ELSE
         |     CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
         |          AS DOUBLE) / len(ws) END AS alpha_word_frac,
         |   CAST(len(list_filter(['the', 'and', 'of', 'to', 'a', 'in', 'is', 'it'],
         |                        m -> list_contains(lw, m))) AS INT) AS n_stop_hits
         |  FROM d)
         |SELECT sig.*,
         |  (n_words >= 5 AND mean_word_len BETWEEN 2.0 AND 12.0
         |   AND symbol_word_ratio <= 0.1 AND dup_word_frac <= 0.5
         |   AND coalesce(dup_line_frac <= 0.3, true)
         |   AND coalesce(bullet_line_frac <= 0.9, true)
         |   AND coalesce(ellipsis_line_frac <= 0.3, true)
         |   AND alpha_word_frac >= 0.7 AND n_stop_hits >= 2) AS gopher_keep
         |FROM sig ORDER BY doc_id""".stripMargin,

    "gopher_topgram" ->
      s"""WITH ${normWordsFrom("documents")},
         | g AS (SELECT doc_id,
         |   unnest([array_to_string(ws[x:x+1], ' ')
         |           for x in generate_series(1, len(ws)-1)]) AS gram
         |   FROM nw WHERE len(ws) >= 2),
         | c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
         | a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
         |         max(cnt) AS top_count FROM c GROUP BY 1)
         |SELECT doc_id, n_grams, top_count,
         |  CAST(top_count AS DOUBLE) / n_grams AS top_gram_frac
         |FROM a ORDER BY doc_id""".stripMargin,

    "pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example or +1 555-123-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 acct '
        |      || lpad(CAST(doc_id % 100000 AS VARCHAR), 16, '9') AS t
        |  FROM documents),
        | s1 AS (SELECT doc_id, t,
        |   regexp_replace(regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g'),
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g') AS a1 FROM aug),
        | s2 AS (SELECT *, regexp_replace(a1,
        |   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS a2
        |   FROM s1),
        | s3 AS (SELECT *, regexp_replace(a2,
        |   '\+?[0-9]{0,2}[- ]?\(?[0-9]{3}\)?[- ][0-9]{3}[- ][0-9]{4}',
        |   '<PHONE>', 'g') AS a3 FROM s2)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))
        |       AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(a1,
        |       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |       AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(a2,
        |       '\+?[0-9]{0,2}[- ]?\(?[0-9]{3}\)?[- ][0-9]{3}[- ][0-9]{4}'))
        |       AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(a3, '\b[0-9]{13,19}\b')) AS INT) AS n_idnums,
        |  trim(regexp_replace(regexp_replace(a3, '\b[0-9]{13,19}\b', '<NUM>', 'g'),
        |       '\s+', ' ', 'g')) AS redacted_text
        |FROM s3 ORDER BY doc_id""".stripMargin,

    "decontaminate" ->
      s"""WITH ${normWordsFrom("documents")},
         | g AS (SELECT doc_id,
         |   list_distinct([array_to_string(ws[x:x+2], ' ')
         |                  for x in generate_series(1, len(ws)-2)]) AS sh
         |   FROM nw WHERE len(ws) >= 3),
         | cg AS (SELECT doc_id, len(sh) AS n_grams, unnest(sh) AS gram FROM g),
         | eg AS (SELECT doc_id AS eval_id, unnest(sh) AS gram FROM g
         |        WHERE doc_id % 50 = 0)
         |SELECT cg.doc_id, eg.eval_id, count(*) AS n_shared,
         |  CAST(count(*) AS DOUBLE) / cg.n_grams AS overlap_frac
         |FROM cg JOIN eg ON cg.gram = eg.gram
         |WHERE cg.doc_id <> eg.eval_id
         |GROUP BY cg.doc_id, eg.eval_id, cg.n_grams
         |HAVING count(*) >= 2
         |ORDER BY doc_id, eval_id""".stripMargin,

    "corpus_sample" ->
      """SELECT doc_id, source, bucket AS sample_bucket FROM (
        |  SELECT doc_id, source,
        |    substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS bucket,
        |    CASE source WHEN 'src0' THEN 'cccccccc'
        |                WHEN 'src1' THEN '80000000'
        |                WHEN 'src2' THEN '00000000'
        |                ELSE '40000000' END AS threshold
        |  FROM documents)
        |WHERE bucket < threshold ORDER BY doc_id""".stripMargin,

    "corpus_take" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5('take|' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS INT) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 15 ORDER BY doc_id""".stripMargin,

    // same augmentation, same two-stage strip (script/style content first,
    // tags second), same entity order with &amp; last; plain replace() for
    // entities (no metacharacters), regex dialect kept to Java∩RE2
    "html_extract" ->
      """WITH aug AS (SELECT doc_id,
        |  '<html><head><style>p{color:red}</style><script type="text/js">var x'
        |  || CAST(doc_id AS VARCHAR) || ';</script></head><body><p class="main">'
        |  || text ||
        |  '</p><div>Tom &amp; Jerry &lt;3&nbsp;wins &amp;lt;sometimes&amp;gt;</div></body></html>'
        |    AS h FROM documents),
        | s1 AS (SELECT doc_id, h,
        |   regexp_replace(h, '<(script|style)[^>]*>.*?</(script|style)\s*>',
        |                  ' ', 'gis') AS ns FROM aug),
        | s2 AS (SELECT doc_id, h, ns,
        |   regexp_replace(ns, '<[^>]+>', ' ', 'gs') AS nt FROM s1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(h,
        |    '<(script|style)[^>]*>.*?</(script|style)\s*>', 0, 'is')) AS INT)
        |    AS n_scripts,
        |  CAST(len(regexp_extract_all(ns, '<[^>]+>', 0, 's')) AS INT) AS n_tags,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(nt,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS extracted_text
        |FROM s2 ORDER BY doc_id""".stripMargin,

    // A-ES re-derived: u from the md5 hex digits positionally (each term
    // digit * 16^(8-i) is exact in double, the sum <= 2^32 is exact, so u
    // is bitwise the Scala side's conv()-based value); ln matches bitwise
    // across engines (the lm_logprob precedent); weights normalized by the
    // per-stratum max (same multiply-then-divide order as the Scala), key
    // rounded to 6 before ranking with an id tie-break
    "corpus_take_weighted" ->
      """WITH b AS (
        |  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
        |    (list_sum([(strpos('0123456789abcdef',
        |        substr(md5('wtake|' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
        |        * power(16, 8 - i) for i in generate_series(1, 8)]) + 1)
        |      / 4294967296.0 AS u
        |  FROM documents),
        | m AS (SELECT doc_id, source, w, u,
        |     max(w) OVER (PARTITION BY source) AS maxw
        |   FROM b WHERE w > 0),
        | r AS (SELECT doc_id, source, round(ln(u) * maxw / w, 6) AS key
        |   FROM m)
        |SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY key DESC, doc_id) AS INT) AS sample_rank
        |  FROM r)
        |WHERE sample_rank <= 20 ORDER BY doc_id""".stripMargin,

    // chunk arithmetic re-derived: stride 32, nchunks = ceil(max(n-8,1)/32),
    // inclusive 1-based slices clamp at the tail on both engines
    "chunk_docs" ->
      s"""WITH ${normWordsFrom("documents")},
         | c AS (SELECT doc_id, ws,
         |     CAST(ceil(CAST(greatest(len(ws) - 8, 1) AS DOUBLE) / 32) AS INT)
         |       AS nchunks
         |   FROM nw WHERE len(ws) > 0 AND ws <> ['']),
         | e AS (SELECT doc_id, ws,
         |     unnest(generate_series(0, nchunks - 1)) AS i FROM c)
         |SELECT doc_id, CAST(i AS INT) AS chunk_id,
         |  array_to_string(ws[i * 32 + 1 : i * 32 + 40], ' ') AS chunk_text,
         |  CAST(least(40, len(ws) - i * 32) AS INT) AS n_tokens
         |FROM e ORDER BY doc_id, chunk_id""".stripMargin,

    // cumulative thresholds are the Scala side's exact doubles:
    // floor(0.8 * 2^32) = cccccccc, floor((0.8 + 0.1) * 2^32) = e6666666;
    // the last split is the CASE's ELSE, so coverage is exact
    "corpus_split" ->
      """SELECT doc_id, b AS split_bucket,
        |  CASE WHEN b < 'cccccccc' THEN 'train'
        |       WHEN b < 'e6666666' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "pack_shards" ->
      """SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000) AS BIGINT) AS shard_id,
        |  CAST(cum - n_tokens
        |    - CAST(floor((cum - n_tokens) / 2000) AS BIGINT) * 2000 AS BIGINT)
        |    AS shard_offset
        |FROM (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM (SELECT doc_id, source,
        |          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |            AS n_tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "lm_logprob" ->
      s"""WITH ${normWordsFrom("documents")},
         | t AS (SELECT doc_id, unnest(ws) AS term FROM nw),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM t
         |        WHERE term <> '' GROUP BY 1, 2),
         | freq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
         | tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total,
         |                count(*) AS v FROM freq),
         | scored AS (SELECT tf.doc_id, tf.tf,
         |     ln((freq.cnt + 1.0) / (tot.t_total + tot.v)) AS lp
         |   FROM tf JOIN freq USING (term), tot)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  round(sum(tf * lp), 6) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // same LM CTEs as lm_logprob, then a per-language ntile over
    // (score DESC, doc_id) — the deterministic total order both engines
    // share because the score doubles are bitwise-identical (lm_logprob
    // green) and ntile's extra-row rule is SQL-standard in both
    "ccnet_buckets" ->
      s"""WITH ${normWordsFrom("documents")},
         | t AS (SELECT doc_id, unnest(ws) AS term FROM nw),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM t
         |        WHERE term <> '' GROUP BY 1, 2),
         | freq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
         | tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total,
         |                count(*) AS v FROM freq),
         | scored AS (SELECT tf.doc_id, tf.tf,
         |     ln((freq.cnt + 1.0) / (tot.t_total + tot.v)) AS lp
         |   FROM tf JOIN freq USING (term), tot),
         | lps AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |     round(sum(tf * lp), 6) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |   FROM scored GROUP BY 1),
         | b AS (SELECT d.doc_id, d.lang, lps.n_tokens, lps.avg_logprob,
         |     CAST(ntile(3) OVER (PARTITION BY d.lang
         |       ORDER BY lps.avg_logprob DESC, d.doc_id) AS INT) AS bucket
         |   FROM documents d JOIN lps ON d.doc_id = lps.doc_id)
         |SELECT doc_id, lang, n_tokens, avg_logprob, bucket,
         |  CASE WHEN bucket = 1 THEN 'head'
         |       WHEN bucket = 3 THEN 'tail'
         |       ELSE 'middle' END AS bucket_name
         |FROM b ORDER BY doc_id""".stripMargin,

    // decontaminate's gram join re-aggregated to eval grain, then a left
    // join back to the full eval carve so clean samples report 0/false
    "contamination_report" ->
      s"""WITH ${normWordsFrom("documents")},
         | g AS (SELECT doc_id,
         |   list_distinct([array_to_string(ws[x:x+2], ' ')
         |                  for x in generate_series(1, len(ws)-2)]) AS sh
         |   FROM nw WHERE len(ws) >= 3),
         | cg AS (SELECT doc_id, len(sh) AS n_grams, unnest(sh) AS gram FROM g),
         | eg AS (SELECT doc_id AS eval_id, unnest(sh) AS gram FROM g
         |        WHERE doc_id % 50 = 0),
         | pairs AS (SELECT cg.doc_id, eg.eval_id, count(*) AS n_shared,
         |     CAST(count(*) AS DOUBLE) / cg.n_grams AS overlap_frac
         |   FROM cg JOIN eg ON cg.gram = eg.gram
         |   WHERE cg.doc_id <> eg.eval_id
         |   GROUP BY cg.doc_id, eg.eval_id, cg.n_grams
         |   HAVING count(*) >= 2),
         | hits AS (SELECT eval_id,
         |     CAST(count(*) AS INT) AS n_contaminated_docs,
         |     max(n_shared) AS max_shared,
         |     round(max(overlap_frac), 6) AS max_overlap_frac,
         |     min(doc_id) AS example_doc
         |   FROM pairs GROUP BY 1)
         |SELECT e.doc_id AS eval_id,
         |  coalesce(h.n_contaminated_docs, 0) AS n_contaminated_docs,
         |  h.max_shared, h.max_overlap_frac, h.example_doc,
         |  coalesce(h.n_contaminated_docs, 0) > 0 AS contaminated
         |FROM documents e LEFT JOIN hits h ON e.doc_id = h.eval_id
         |WHERE e.doc_id % 50 = 0 ORDER BY eval_id""".stripMargin,

    "corpus_report" ->
      s"""WITH $wordsSql,
         | q AS (SELECT doc_id, text, len(ws) AS n_words,
         |    (CASE WHEN len(ws) >= 5 THEN 1.0 ELSE 0.0 END)
         |      * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text))
         |      * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text))
         |      AS quality_score
         |  FROM w),
         | a AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |    CAST(count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS DOUBLE) AS n_unique,
         |    CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE) AS total_tokens,
         |    round(sum(quality_score), 6) AS q_sum
         |  FROM q)
         |SELECT metric, value FROM (
         |  SELECT 'n_docs' AS metric, n_docs AS value FROM a
         |  UNION ALL SELECT 'n_unique_texts', n_unique FROM a
         |  UNION ALL SELECT 'dup_rate', round(1.0 - n_unique / n_docs, 6) FROM a
         |  UNION ALL SELECT 'total_tokens', total_tokens FROM a
         |  UNION ALL SELECT 'mean_doc_tokens', total_tokens / n_docs FROM a
         |  UNION ALL SELECT 'mean_quality', q_sum / n_docs FROM a)
         |ORDER BY metric""".stripMargin,

    // the quality_lr sigmoid (same literal model, same addition order),
    // rounded to 6, then the stratifiedSample md5 acceptance rule
    "corpus_weighted" ->
      s"""WITH $wordsSql,
         | f AS (SELECT doc_id,
         |    CAST(len(ws) AS DOUBLE) AS n_words,
         |    CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws) AS avg_word_len,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |    CAST(len(list_filter(ws, x -> x IN ${markersIn("en")})) AS DOUBLE) / len(ws) AS stopword_ratio
         |  FROM w),
         | sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(
         |    0.1 + 0.4 * ((n_words - 50.0) / 20.0)
         |        + (-0.3) * ((avg_word_len - 4.5) / 1.0)
         |        + 1.2 * ((alpha_ratio - 0.8) / 0.1)
         |        + (-1.5) * ((punct_ratio - 0.02) / 0.02)
         |        + 0.8 * ((stopword_ratio - 0.1) / 0.05)))), 6) AS weight
         |  FROM f),
         | b AS (SELECT doc_id, weight,
         |    substr(md5('imp|' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_bucket
         |  FROM sc)
         |SELECT doc_id, weight, sample_bucket FROM b
         |WHERE weight >= 1.0 OR sample_bucket <
         |  lpad(lower(to_hex(CAST(least(floor(weight * 4294967296), 4294967295)
         |                         AS BIGINT))), 8, '0')
         |ORDER BY doc_id""".stripMargin,

    "text_unicode" ->
      """WITH u AS (SELECT doc_id,
        |    text || ' Caf' || 'e' || chr(769)
        |         || ' se' || chr(241) || 'or Z' || chr(252) || 'rich '
        |         || chr(192) || chr(201) || chr(206) || chr(213) || chr(220)
        |         || ' #' || doc_id AS t
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(t) AS norm_text,
        |  strip_accents(nfc_normalize(t)) AS plain_text
        |FROM u ORDER BY doc_id""".stripMargin,

    // sigmoid(w·standardize(x) + b) with the SAME literal model and the
    // SAME left-assoc addition order as QualityClassifier.scoreCol
    "quality_lr" ->
      s"""WITH $wordsSql,
         | f AS (SELECT doc_id,
         |    CAST(len(ws) AS DOUBLE) AS n_words,
         |    CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws) AS avg_word_len,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |    CAST(len(list_filter(ws, x -> x IN ${markersIn("en")})) AS DOUBLE) / len(ws) AS stopword_ratio
         |  FROM w),
         | z AS (SELECT doc_id,
         |    0.1 + 0.4 * ((n_words - 50.0) / 20.0)
         |        + (-0.3) * ((avg_word_len - 4.5) / 1.0)
         |        + 1.2 * ((alpha_ratio - 0.8) / 0.1)
         |        + (-1.5) * ((punct_ratio - 0.02) / 0.02)
         |        + 0.8 * ((stopword_ratio - 0.1) / 0.05) AS z
         |  FROM f)
         |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS lr_quality
         |FROM z ORDER BY doc_id""".stripMargin,

    "lm_bigram" ->
      s"""WITH ${normWordsFrom("documents")},
         | bg AS (SELECT doc_id, ws[i] AS ctx, ws[i+1] AS nxt
         |        FROM nw, unnest(generate_series(1, len(ws) - 1)) t(i)
         |        WHERE ws[i] <> '' AND ws[i+1] <> ''),
         | tf AS (SELECT doc_id, ctx, nxt, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
         | bgf AS (SELECT ctx, nxt, CAST(sum(tf) AS BIGINT) AS bg_cnt
         |         FROM tf GROUP BY 1, 2),
         | ctxf AS (SELECT ctx, CAST(sum(tf) AS BIGINT) AS ctx_cnt
         |          FROM tf GROUP BY 1),
         | voc AS (SELECT count(DISTINCT nxt) AS v FROM tf),
         | scored AS (SELECT tf.doc_id, tf.tf,
         |     ln((bgf.bg_cnt + 1.0) / (ctxf.ctx_cnt + voc.v)) AS lp
         |   FROM tf JOIN bgf USING (ctx, nxt) JOIN ctxf USING (ctx), voc)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  round(sum(tf * lp), 6) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // interpolated Kneser-Ney with d = 0.75; the association order of the
    // probability expression matches the Scala side token-for-token so
    // IEEE doubles agree (round(6) on the sum absorbs ln()'s last ulp)
    "lm_kn" ->
      s"""WITH ${normWordsFrom("documents")},
         | bg AS (SELECT doc_id, ws[i] AS ctx, ws[i+1] AS nxt
         |        FROM nw, unnest(generate_series(1, len(ws) - 1)) t(i)
         |        WHERE ws[i] <> '' AND ws[i+1] <> ''),
         | tf AS (SELECT doc_id, ctx, nxt, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
         | bgf AS (SELECT ctx, nxt, CAST(sum(tf) AS BIGINT) AS bg_cnt
         |         FROM tf GROUP BY 1, 2),
         | ctxs AS (SELECT ctx, CAST(sum(bg_cnt) AS BIGINT) AS ctx_cnt,
         |            count(*) AS n1_fwd
         |          FROM bgf GROUP BY 1),
         | conts AS (SELECT nxt, count(*) AS n1_bwd FROM bgf GROUP BY 1),
         | bt AS (SELECT count(*) AS b_types FROM bgf),
         | scored AS (SELECT tf.doc_id, tf.tf,
         |     ln((greatest(bgf.bg_cnt - 0.75, 0.0) / ctxs.ctx_cnt)
         |        + (((0.75 * ctxs.n1_fwd) / ctxs.ctx_cnt)
         |           * (CAST(conts.n1_bwd AS DOUBLE) / bt.b_types))) AS lp
         |   FROM tf JOIN bgf USING (ctx, nxt) JOIN ctxs USING (ctx)
         |        JOIN conts USING (nxt), bt)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  round(sum(tf * lp), 6) / CAST(sum(tf) AS BIGINT) AS avg_logprob
         |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // winnowing: k=4 grams, w=5 windows; the sortable-string argmin
    // (md5 || lpad(10^10 - pos)) reproduces Spark's selection exactly;
    // window starts clamped to full windows, short docs get one window
    "fingerprint_winnow" ->
      s"""WITH ${normWordsFrom("documents")},
         | g AS (SELECT doc_id, s AS pos, len(ws) - 3 AS n_grams,
         |         md5(array_to_string(ws[s:s+3], ' '))
         |           || lpad(CAST(9999999999 - s AS VARCHAR), 10, '0') AS comb
         |       FROM nw, unnest(generate_series(1, len(ws) - 3)) t(s)
         |       WHERE len(ws) >= 4),
         | m AS (SELECT doc_id, pos, n_grams,
         |         min(comb) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS sel
         |       FROM g),
         | sels AS (SELECT DISTINCT doc_id, sel FROM m
         |          WHERE pos <= greatest(1, n_grams - 4))
         |SELECT doc_id, substr(sel, 1, 32) AS fp,
         |  CAST(9999999999 - CAST(substr(sel, 33, 10) AS BIGINT) AS INT) AS pos
         |FROM sels ORDER BY doc_id, pos""".stripMargin,

    "mixture_plan" ->
      """WITH tok AS (SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        | avail AS (SELECT source, CAST(sum(n) AS BIGINT) AS tokens_available
        |          FROM tok GROUP BY 1)
        |SELECT source, tokens_available,
        |  CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |              WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
        |              WHEN 'src2' THEN CAST(0.2 AS DOUBLE) END AS weight,
        |  CAST(floor(CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |                         WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
        |                         WHEN 'src2' THEN CAST(0.2 AS DOUBLE) END * 2000)
        |       AS BIGINT) AS target_tokens,
        |  least(1.0,
        |    CAST(floor(CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |                           WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
        |                           WHEN 'src2' THEN CAST(0.2 AS DOUBLE) END * 2000)
        |         AS BIGINT) / tokens_available) AS rate
        |FROM avail WHERE source IN ('src0', 'src1', 'src2')
        |ORDER BY source""".stripMargin,

    "corpus_mixture" ->
      """WITH tok AS (SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        | avail AS (SELECT source, sum(n) AS tokens_available FROM tok GROUP BY 1),
        | plan1 AS (SELECT source,
        |     CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |                 WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
        |                 WHEN 'src2' THEN CAST(0.2 AS DOUBLE) END AS weight,
        |     tokens_available
        |   FROM avail WHERE source IN ('src0', 'src1', 'src2')),
        | plan2 AS (SELECT source,
        |     least(1.0, CAST(floor(weight * 2000) AS BIGINT) / tokens_available) AS rate
        |   FROM plan1),
        | s AS (SELECT d.doc_id, d.source, p.rate,
        |     substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS sample_bucket,
        |     lpad(lower(to_hex(CAST(least(floor(p.rate * 4294967296), 4294967295)
        |                            AS BIGINT))), 8, '0') AS thr
        |   FROM documents d JOIN plan2 p ON d.source = p.source)
        |SELECT doc_id, source, sample_bucket FROM s
        |WHERE rate >= 1.0 OR sample_bucket < thr
        |ORDER BY doc_id""".stripMargin,

    "tfidf_topterms" ->
      s"""WITH ${normWordsFrom("documents")},
         | t AS (SELECT doc_id, unnest(ws) AS term FROM nw),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM t
         |        WHERE term <> '' GROUP BY 1, 2),
         | dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
         | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         | scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         |     round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf
         |   FROM tf JOIN dfreq USING (term), n),
         | ranked AS (SELECT *, row_number() OVER
         |     (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM scored)
         |SELECT doc_id, term, tf, df, tfidf, CAST(rn AS INT) AS rank
         |FROM ranked WHERE rn <= 5 ORDER BY doc_id, rank""".stripMargin,

    // Okapi BM25: every score input is an exact integer or a quotient of
    // exact integers, and the expression tree below mirrors the Scala
    // operator association token for token (SURVEY §4 — round once, at
    // the end, of bit-identical doubles). Every fractional literal is
    // CAST to DOUBLE: DuckDB types a bare `1.2` as DECIMAL and evaluates
    // the arithmetic exactly, which diverges from Spark's step-by-step
    // double evaluation at the 6th decimal (the round-10 hash miss).
    // `(1.2 + 1.0)` is written as the runtime double sum, not `2.2`, to
    // match `lit(k1 + 1.0)` exactly.
    "bm25_topterms" ->
      s"""WITH ${normWordsFrom("documents")},
         | t AS (SELECT doc_id, unnest(ws) AS term FROM nw),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM t
         |        WHERE term <> '' GROUP BY 1, 2),
         | dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
         | dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         | stats AS (SELECT count(*) AS n_docs,
         |     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         | scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, dl.dl,
         |     ln(CAST(1.0 AS DOUBLE) + (stats.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
         |        / (dfreq.df + CAST(0.5 AS DOUBLE))) AS idf_raw,
         |     round(ln(CAST(1.0 AS DOUBLE) + (stats.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
         |         / (dfreq.df + CAST(0.5 AS DOUBLE)))
         |       * (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |       / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
         |            + CAST(0.75 AS DOUBLE) * (dl.dl / stats.avgdl))), 6) AS bm25
         |   FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats),
         | ranked AS (SELECT *, row_number() OVER
         |     (PARTITION BY doc_id ORDER BY bm25 DESC, term) AS rn FROM scored)
         |SELECT doc_id, term, tf, df, dl, round(idf_raw, 6) AS idf, bm25,
         |  CAST(rn AS INT) AS rank
         |FROM ranked WHERE rn <= 5 ORDER BY doc_id, rank""".stripMargin,

    "line_dedup" ->
      s"""WITH ${normWordsFrom("documents")},
         | l AS (SELECT doc_id, i AS pos,
         |         array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ') AS line
         |       FROM nw,
         |         unnest(generate_series(0, CAST(floor((len(ws) - 1) / 8.0) AS INT))) t(i)
         |       WHERE trim(array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ')) <> ''),
         | boiler AS (SELECT line FROM l GROUP BY line
         |            HAVING count(DISTINCT doc_id) >= 2),
         | kept AS (SELECT l.* FROM l WHERE l.line NOT IN (SELECT line FROM boiler)),
         | tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY 1),
         | ka AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         |          count(*) AS n_kept FROM kept GROUP BY 1)
         |SELECT d.doc_id, coalesce(ka.clean_text, '') AS clean_text,
         |  coalesce(ka.n_kept, 0) AS n_lines_kept,
         |  coalesce(tot.n_lines, 0) - coalesce(ka.n_kept, 0) AS n_lines_removed
         |FROM documents d
         |LEFT JOIN tot ON d.doc_id = tot.doc_id
         |LEFT JOIN ka ON d.doc_id = ka.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // the C4 rules re-derived in SQL over the same synthesized lines:
    // periods on even-index lines, injected lorem/brace tails by doc_id
    // (the %17 CASE wins when both divide, matching the Scala when-chain)
    "text_c4" ->
      s"""WITH ${normWordsFrom("documents")},
         | synth AS (SELECT doc_id, i,
         |             CASE WHEN i % 2 = 0
         |               THEN array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ') || '.'
         |               ELSE array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ') END AS line
         |           FROM nw,
         |             unnest(generate_series(0, CAST(floor((len(ws) - 1) / 8.0) AS INT))) t(i)),
         | inj AS (SELECT doc_id, 1000000 AS i,
         |           CASE WHEN doc_id % 17 = 0 THEN 'lorem ipsum dolor sit amet.'
         |                ELSE 'function() { return 1; }' END AS line
         |         FROM documents WHERE doc_id % 17 = 0 OR doc_id % 23 = 0),
         | l AS (SELECT doc_id, i, trim(line) AS line FROM
         |         (SELECT * FROM synth UNION ALL SELECT * FROM inj)
         |       WHERE trim(line) <> ''),
         | flags AS (SELECT doc_id,
         |             bool_or(contains(lower(line), 'lorem ipsum')) AS has_lorem,
         |             bool_or(contains(line, '{')) AS has_brace
         |           FROM l GROUP BY 1),
         | k AS (SELECT doc_id, i, line FROM l
         |       WHERE regexp_matches(line, '[.!?"]$$')
         |         AND len(regexp_split_to_array(line, '\\s+')) >= 5
         |         AND NOT contains(lower(line), 'javascript')),
         | tot AS (SELECT doc_id, count(*) AS n_all FROM l GROUP BY 1),
         | ka AS (SELECT doc_id, count(*) AS n_kept,
         |          string_agg(line, chr(10) ORDER BY i) AS clean_text
         |        FROM k GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(ka.n_kept, 0) AS INT) AS c4_lines_kept,
         |  CAST(coalesce(tot.n_all, 0) - coalesce(ka.n_kept, 0) AS INT)
         |    AS c4_lines_removed,
         |  (NOT coalesce(f.has_lorem, false) AND NOT coalesce(f.has_brace, false)
         |    AND coalesce(ka.n_kept, 0) >= 3) AS c4_page_keep,
         |  coalesce(ka.clean_text, '') AS clean_text
         |FROM documents d
         |LEFT JOIN tot ON d.doc_id = tot.doc_id
         |LEFT JOIN ka ON d.doc_id = ka.doc_id
         |LEFT JOIN flags f ON d.doc_id = f.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // within-doc duplicated-5-gram election re-derived in SQL over the
    // echoed word list; positions 1-based here vs 0-based in Spark (only
    // intra-side consistency matters, the output carries no positions)
    "text_dup_ngrams" ->
      s"""WITH ${normWordsFrom("documents")},
         | aug AS (SELECT doc_id, ws || list_slice(ws, 1, 16) AS ws FROM nw),
         | win AS (SELECT doc_id, unnest(generate_series(1, len(ws) - 4)) AS s, ws
         |         FROM aug WHERE len(ws) >= 5),
         | winh AS (SELECT doc_id, s,
         |            md5(array_to_string(ws[s:s+4], ' ')) AS wkey FROM win),
         | dupw AS (SELECT doc_id, s FROM (
         |            SELECT doc_id, s,
         |              count(*) OVER (PARTITION BY doc_id, wkey) AS n_occ,
         |              min(s) OVER (PARTITION BY doc_id, wkey) AS min_s
         |            FROM winh) WHERE n_occ >= 2 AND s <> min_s),
         | cov AS (SELECT DISTINCT doc_id, s + o AS pos FROM dupw
         |         CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS o)),
         | toke AS (SELECT doc_id, unnest(ws) AS tok,
         |            unnest(generate_series(1, len(ws))) AS pos FROM aug),
         | tot AS (SELECT doc_id, count(*) AS n_tokens, sum(length(tok)) AS chars
         |         FROM toke WHERE tok <> '' GROUP BY 1),
         | dupc AS (SELECT t.doc_id, sum(length(t.tok)) AS dup_chars FROM toke t
         |          JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |          WHERE t.tok <> '' GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(tot.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(dupc.dup_chars, 0) AS DOUBLE) / nullif(tot.chars, 0)
         |    AS dup_ngram_char_frac
         |FROM documents d
         |LEFT JOIN tot ON d.doc_id = tot.doc_id
         |LEFT JOIN dupc ON d.doc_id = dupc.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // same 8-word re-lining as line_dedup, plus the every-third-line echo;
    // fracs are raw int/int double divisions (deterministic cross-engine)
    "text_repetition" ->
      s"""WITH ${normWordsFrom("documents")},
         | base AS (SELECT doc_id, i,
         |            array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' ') AS line
         |          FROM nw,
         |            unnest(generate_series(0, CAST(floor((len(ws) - 1) / 8.0) AS INT))) t(i)),
         | l0 AS (SELECT doc_id, line FROM base WHERE trim(line) <> ''
         |        UNION ALL
         |        SELECT doc_id, line FROM base WHERE i % 3 = 0 AND trim(line) <> ''),
         | per AS (SELECT doc_id, lower(trim(line)) AS l, count(*) AS cnt
         |         FROM l0 GROUP BY 1, 2),
         | sig AS (SELECT doc_id, sum(cnt) AS n_lines,
         |           sum(cnt) - count(*) AS n_dup,
         |           sum(cnt * length(l)) AS chars,
         |           sum((cnt - 1) * length(l)) AS dup_chars
         |         FROM per GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(sig.n_lines, 0) AS BIGINT) AS n_lines,
         |  CAST(coalesce(sig.n_dup, 0) AS BIGINT) AS n_dup_lines,
         |  CAST(sig.n_dup AS DOUBLE) / nullif(sig.n_lines, 0) AS dup_line_frac,
         |  CAST(sig.dup_chars AS DOUBLE) / nullif(sig.chars, 0) AS dup_line_char_frac
         |FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "url_canon" ->
      s"""WITH $urlCtes
         |SELECT doc_id, url, canonical_url, host FROM canon
         |ORDER BY doc_id""".stripMargin,

    "url_host_stats" ->
      s"""WITH $urlCtes
         |SELECT host, count(*) AS n_docs,
         |  count(DISTINCT canonical_url) AS n_urls
         |FROM canon GROUP BY host ORDER BY host""".stripMargin,

    "url_host_cap" ->
      s"""WITH $urlCtes,
         | ranked AS (SELECT doc_id, host,
         |    CAST(row_number() OVER (PARTITION BY host
         |      ORDER BY md5('hostcap|' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS INT) AS host_rank
         |  FROM canon)
         |SELECT doc_id, host, host_rank FROM ranked
         |WHERE host_rank <= 50 ORDER BY doc_id""".stripMargin,

    // the windowless shape: census → rate cap/n → shared hex-threshold
    // encoding ('g' = keep-all under the cap; every hex char < 'g');
    // 50.0/n and floor(rate*2^32) are double math in both engines
    "url_host_cap_approx" ->
      s"""WITH $urlCtes,
         | census AS (SELECT host AS h, count(*) AS n FROM canon GROUP BY 1),
         | thr AS (SELECT h, CASE WHEN n <= 50 THEN 'g'
         |    ELSE lpad(lower(to_hex(CAST(least(floor(50.0 / n * 4294967296),
         |                                     4294967295) AS BIGINT))), 8, '0')
         |    END AS t
         |  FROM census)
         |SELECT c.doc_id, c.host, CAST(NULL AS INT) AS host_rank
         |FROM canon c JOIN thr ON c.host = thr.h
         |WHERE substr(md5('hostcap|' || CAST(c.doc_id AS VARCHAR)), 1, 8) < thr.t
         |ORDER BY c.doc_id""".stripMargin,

    // window hashes + canonical (first-occurrence) election re-derived in
    // SQL; positions are 1-based here vs 0-based in Spark — only intra-side
    // consistency matters, the output carries no positions
    "dedup_substring" ->
      s"""WITH ${normWordsFrom("documents")},
         | win AS (SELECT doc_id, unnest(generate_series(1, len(ws) - 11)) AS s, ws
         |         FROM nw WHERE len(ws) >= 12),
         | winh AS (SELECT doc_id, s,
         |            md5(array_to_string(ws[s:s+11], ' ')) AS wkey FROM win),
         | stats AS (SELECT wkey, count(*) AS n_occ, min(doc_id) AS can_doc
         |           FROM winh GROUP BY 1),
         | canp AS (SELECT w.wkey, min(w.s) AS can_pos FROM winh w
         |          JOIN stats st ON w.wkey = st.wkey AND w.doc_id = st.can_doc
         |          GROUP BY 1),
         | dup AS (SELECT st.wkey, st.can_doc, c.can_pos
         |         FROM stats st JOIN canp c USING (wkey) WHERE st.n_occ >= 2),
         | dupw AS (SELECT w.doc_id, w.s,
         |            (w.doc_id = d.can_doc AND w.s = d.can_pos) AS is_can
         |          FROM winh w JOIN dup d USING (wkey)),
         | cov AS (SELECT doc_id, s + o AS pos FROM dupw
         |         CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS o)
         |         GROUP BY 1, 2 HAVING NOT bool_or(is_can)),
         | toke AS (SELECT doc_id, unnest(ws) AS tok,
         |            unnest(generate_series(1, len(ws))) AS pos FROM nw),
         | kept AS (SELECT t.* FROM toke t
         |          ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |          WHERE t.tok <> ''),
         | tot AS (SELECT doc_id, count(*) AS n_toks FROM toke
         |         WHERE tok <> '' GROUP BY 1),
         | ka AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         |          count(*) AS n_kept FROM kept GROUP BY 1)
         |SELECT d.doc_id, coalesce(ka.clean_text, '') AS clean_text,
         |  coalesce(ka.n_kept, 0) AS n_tokens_kept,
         |  coalesce(tot.n_toks, 0) - coalesce(ka.n_kept, 0) AS n_tokens_removed
         |FROM documents d
         |LEFT JOIN tot ON d.doc_id = tot.doc_id
         |LEFT JOIN ka ON d.doc_id = ka.doc_id
         |ORDER BY d.doc_id""".stripMargin
  )

  // bounded-lifetime contract (VERDICT r19 #4)
  Fixtures.onClear { () =>
    fpStores.clear(); fpBlooms.clear()
  }
}
