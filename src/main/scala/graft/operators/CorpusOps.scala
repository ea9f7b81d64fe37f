package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus-level training-data operations beyond per-document scoring:
  * benchmark decontamination, deterministic stratified sampling, and
  * token-budget shard packing — the steps between "curated documents" and
  * "training mixture on disk".
  */
object CorpusOps {

  /** Benchmark decontamination: find training documents sharing at least
    * `minOverlap` distinct word n-grams with any document of an evaluation
    * set (the published practice for decontaminating pretraining corpora
    * against test sets — n-gram collision, not fuzzy similarity, so a
    * verbatim leaked passage cannot hide behind paraphrase-level scores).
    *
    * Scale shape: both sides explode to distinct n-grams and meet in ONE
    * equi-join keyed by the n-gram — never doc×eval pairs. The join input
    * is |corpus n-grams| + |eval n-grams| rows; the eval side is tiny by
    * definition (benchmarks, not corpora), so at 100 TB Spark broadcasts
    * it and the corpus side never shuffles at all. Common n-grams cannot
    * skew the join beyond eval-side multiplicity, and raising `n` makes
    * collisions rarer, not hotter.
    *
    * @return one row per contaminated (doc, eval doc) pair with the shared
    *         count and the fraction of the doc's n-grams that leaked.
    */
  def decontaminate(corpus: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, evalIdCol: String, evalTextCol: String,
                    n: Int = 5, minOverlap: Int = 2): DataFrame = {
    require(n >= 2, s"n=$n: decontamination n-grams need n >= 2")
    require(minOverlap >= 1, s"minOverlap=$minOverlap must be >= 1")
    // Grams via index explode: the generator's child is a cheap int
    // sequence and each gram is assembled once per OUTPUT row from the
    // materialized words array. Exploding a higher-order-function-built
    // shingle array instead measures ~7x slower here — HOF expressions
    // under Generate fall out of codegen and get re-evaluated wholesale —
    // so the corpus side deliberately emits non-distinct grams and the
    // aggregate counts distinct, rather than paying array_distinct inside
    // a generator child.
    def grams(df: DataFrame, id: Column, text: Column, idName: String) = {
      // guard, don't clamp: sequence(1, 0) is a DESCENDING [1, 0] in
      // Spark, which would feed slice a start of 0 on sub-n-word docs
      val idxs = when(size(col("_ws")) >= n,
        sequence(lit(1), size(col("_ws")) - (n - 1)))
        .otherwise(array().cast("array<int>"))
      df.select(id.as(idName), normWords(text).as("_ws"))
        .withColumn("n_grams", size(shingles(col("_ws"), n)))
        .select(col(idName), col("n_grams"), col("_ws"), explode(idxs).as("_i"))
        .select(col(idName), col("n_grams"),
          concat_ws(" ", slice(col("_ws"), col("_i"), lit(n))).as("gram"))
    }
    val corpusGrams = grams(corpus, col(idCol), col(textCol), "doc_id_")
    val evalGrams = grams(eval, col(evalIdCol), col(evalTextCol), "eval_id_")
      .select(col("eval_id_"), col("gram")).distinct()
    corpusGrams
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id_").as(idCol), col("eval_id_").as("eval_id"),
        col("n_grams"))
      .agg(countDistinct(col("gram")).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
      .select(col(idCol), col("eval_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("overlap_frac"))
  }

  /** Per-eval-sample contamination audit — the report a benchmark owner
    * reads AFTER [[decontaminate]] says "something leaked": one row per
    * EVAL document (including clean ones), with how many corpus documents
    * share at least `minOverlap` n-grams with it, the worst single-doc
    * overlap, and one example offender (the smallest contaminated corpus
    * id — deterministic, so reports diff cleanly across corpus versions).
    * [[decontaminate]] answers "which training docs must go";  this
    * answers "which benchmark items are compromised and how badly" — the
    * two directions of the same join.
    *
    * Scale shape: rides [[decontaminate]]'s single gram-keyed equi-join
    * (eval side broadcast, corpus never shuffles), then shrinks to eval
    * grain — the aggregate output is |eval| rows, tiny by definition. The
    * final left join runs at eval grain on both sides. */
  def contaminationReport(corpus: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, evalIdCol: String,
                          evalTextCol: String, n: Int = 5,
                          minOverlap: Int = 2,
                          excludeSelf: Boolean = false): DataFrame = {
    val pairs = decontaminate(corpus, eval, idCol, textCol,
      evalIdCol, evalTextCol, n, minOverlap)
    // when the eval set was carved from the corpus itself (held-out
    // split), a doc trivially "contaminates" its own eval copy — drop it
    val hits = (if (excludeSelf) pairs.where(col(idCol) =!= col("eval_id"))
                else pairs)
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).cast("int").as("n_contaminated_docs"),
        max(col("n_shared")).as("max_shared"),
        round(max(col("overlap_frac")), 6).as("max_overlap_frac"),
        min(col(idCol)).as("example_doc"))
    eval.select(col(evalIdCol).as("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .withColumn("n_contaminated_docs",
        coalesce(col("n_contaminated_docs"), lit(0)))
      .withColumn("contaminated", col("n_contaminated_docs") > 0)
  }

  /** Deterministic stratified sampling: keep each row iff the first 8 hex
    * chars of md5(salt|id) fall below the per-stratum rate threshold.
    * Sampling by content hash (not `rand()`) means the sample is
    * reproducible across runs, engines, and partitionings — the property a
    * training mixture needs for auditability — and changing one stratum's
    * rate never reshuffles another's sample. Pure map-side filter: at
    * 100 TB it rides the scan, no shuffle, and the parquet reader prunes
    * whole strata whose rate is 0 only if the caller also filters — rates
    * here gate rows, not files.
    *
    * Threshold compare is STRING order on fixed-width lowercase hex ==
    * unsigned numeric order, portable to any engine with md5.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       salt: String = "sample"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"sampling rate $r outside [0,1]"))
    // rate 1.0 = "keep everything" EXACTLY: 'g' sorts after every hex
    // digit, so `bucket < threshold` is vacuously true — a capped hex
    // threshold of ffffffff would still drop the ~1-in-2^32 doc whose
    // bucket is exactly ffffffff (strict compare).
    def hexThreshold(rate: Double): String =
      if (rate >= 1.0) "g"
      else f"${(rate * (1L << 32)).toLong}%08x"
    val bucket = substring(md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 8)
    val threshold = rates.foldRight(lit(hexThreshold(defaultRate)): Column) {
      case ((stratum, rate), alt) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(alt)
    }
    df.withColumn("sample_bucket", bucket).where(col("sample_bucket") < threshold)
  }

  /** EXACTLY-n per-stratum sampling — the eval-set carve: where
    * [[stratifiedSample]] keeps a binomial ~rate·n (right for corpus
    * mixing), a held-out benchmark needs EXACTLY n docs per stratum.
    * Selection order is md5(salt|id) — reproducible across runs, engines
    * and partitionings, and unbiased w.r.t. id order (ids usually encode
    * crawl order). Under-cap strata keep everything.
    *
    * Scale shape: one stratum-keyed `row_number` window — width is one
    * stratum, never the corpus (the [[UrlOps.hostCap]] exact shape; at
    * mega-stratum scale the probabilistic sampler is the right tool
    * anyway). `sample_rank` (1-based selection order) is kept so a later
    * "grow the eval set from n to m" keeps the first n unchanged —
    * ranks are per-doc-stable under ANY n. */
  def takeStratified(docs: DataFrame, idCol: String, strataCol: String,
                     n: Long, salt: String = "take"): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(concat(lit(salt + "|"), col(idCol).cast("string"))), col(idCol))
    docs.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }

  /** Exactly-n WEIGHTED sampling without replacement per stratum —
    * Efraimidis–Spirakis A-ES with deterministic md5 randomness: each doc
    * draws `u = (uint32(md5(salt|id)) + 1) / 2^32 ∈ (0, 1]` and ranks by
    * `ln(u) / w` DESCENDING (the log of the classic `u^(1/w)` key — same
    * order, better conditioned), so inclusion probability is proportional
    * to weight, the draw is reproducible across runs/engines/
    * partitionings, and growing n keeps earlier picks (rank-stable, like
    * [[takeStratified]]). The weighted eval-carve: "500 docs per source,
    * favoring the long/high-quality ones".
    *
    * Non-positive weights are EXCLUDED (A-ES is undefined there; a zero
    * weight means "never sample" in every weighting scheme). Weights are
    * NORMALIZED by the per-stratum maximum before keying — A-ES ordering
    * is invariant under scaling all weights by a constant, and without it
    * large absolute weights (byte counts, ~1e8) would push every key
    * inside the round-6 quantum and silently degenerate the draw into
    * min-id selection. The normalized key is rounded to 6 (SURVEY §4)
    * before ranking with an id tie-break, so the oracle's libm and the
    * JVM's agree on the order. Same scale shape as [[takeStratified]]:
    * one per-stratum window (the max rides the same partitioning) — a
    * mega-stratum serializes through one partition; the Bernoulli
    * [[importanceSample]] is the map-side alternative there. */
  def takeWeighted(docs: DataFrame, idCol: String, strataCol: String,
                   weightCol: String, n: Long,
                   salt: String = "wtake"): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    // working/output columns: withColumn would silently clobber (and for
    // the working pair, the final drop lose) user columns of these names
    // — the rangeJoin _bin rule
    Seq("_maxw", "_key", "sample_rank").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by takeWeighted; rename the input column"))
    val u = (conv(substring(md5(concat(lit(salt + "|"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 1.0) /
      lit(4294967296.0)
    val byStratum = Window.partitionBy(col(strataCol))
    docs.where(col(weightCol) > 0)
      .withColumn("_maxw", max(col(weightCol)).over(byStratum))
      .withColumn("_key",
        round(log(u) * col("_maxw") / col(weightCol), 6))
      .withColumn("sample_rank", row_number().over(
        byStratum.orderBy(col("_key").desc, col(idCol))))
      .where(col("sample_rank") <= n)
      .drop("_maxw", "_key")
  }

  /** Deterministic train/valid/test corpus split: every document lands in
    * exactly one named split by its md5(salt|id) bucket, so the
    * assignment is reproducible across runs, engines and partitionings,
    * and a document's split never changes as the corpus grows (per-doc
    * hash, no global state). The carve-out step before training: holdout
    * membership must stay stable forever, or eval contamination creeps in
    * as shards are re-generated. Pure map-side projection — rides the
    * scan at any scale, zero shuffles.
    *
    * `fractions` is ORDERED (bucket ranges are cumulative in the given
    * order) and must sum to 1; the last split takes the remainder of the
    * bucket space, so coverage is exact — including the ~1-in-2^32 bucket
    * 'ffffffff'. */
  def splitCorpus(docs: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate split names in ${fractions.map(_._1).mkString(", ")}")
    fractions.foreach { case (n, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction $f for split '$n' outside (0,1]") }
    val sum = fractions.map(_._2).sum
    require(math.abs(sum - 1.0) < 1e-9, s"fractions sum to $sum, expected 1.0")
    val bucket = bucketOf(idCol, salt)
    // cumulative upper bounds in the stratifiedSample hex encoding; the
    // last split needs none — it is the otherwise-branch
    val cums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = fractions.init.zip(cums.init).foldRight(
        lit(fractions.last._1): Column) {
      case (((name, _), cum), alt) =>
        when(bucket < lit(f"${(cum * (1L << 32)).toLong}%08x"), lit(name))
          .otherwise(alt)
    }
    docs.withColumn("split_bucket", bucket).withColumn("split", assign)
  }

  /** Token-budget shard packing: assign documents to training shards of
    * ~`budgetTokens` whitespace tokens each. A document lands in the shard
    * where its running token offset starts — shard
    * floor(tokens_before_it / budget) — so every shard holds at least the
    * budget's worth of starts and overflows by at most one document
    * (strict capping would be a sequential scan; offset sharding is the
    * standard distributed approximation, and deterministic in `idCol`
    * order).
    *
    * Scale: the running sum is windowed PER STRATUM (`strataCol`), so
    * window width is one stratum, not the corpus; shard ids are
    * (stratum, local shard). A single giant stratum would still serialize
    * through one window partition — `maxStratumDocs` caps that: any
    * stratum over the cap is pre-split into ceil(n/cap) sub-strata by an
    * md5 prefix of the doc id (deterministic, engine-portable), the window
    * runs per sub-stratum, and the output gains a `pack_stratum` column
    * (`stratum#k` for split strata, the plain stratum otherwise) that
    * `shard_id` is local to. Without the cap the schema is unchanged.
    * The per-stratum census is one tiny aggregate (rows = #strata)
    * broadcast back onto the corpus — the corpus itself never shuffles
    * before the packing window.
    */
  /** Default token counter for budgets: whitespace tokens. Pass
    * `c => size(TextFunctions.bpeTokens(c, merges)).cast("long")` to
    * budget by REAL subword counts from a learned BPE table instead. */
  val WhitespaceTokens: Column => Column = c => size(words(c)).cast("long")

  def packShards(df: DataFrame, idCol: String, textCol: String,
                 strataCol: String, budgetTokens: Long,
                 maxStratumDocs: Option[Long] = None,
                 tokensOf: Column => Column = WhitespaceTokens): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens=$budgetTokens must be >= 1")
    maxStratumDocs match {
      case None => packByKey(df, idCol, textCol, col(strataCol), tokensOf)(budgetTokens)
      case Some(cap) =>
        require(cap >= 1, s"maxStratumDocs=$cap must be >= 1")
        // A raw stratum literally named "web#3" would collide with
        // sub-stratum 3 of a split "web" stratum (one packing window, one
        // output partition for unrelated docs) — reject the separator in
        // stratum names whenever splitting is on. The check rides the
        // census (one row per stratum, not per doc).
        val census = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
          .select(
            when(col(strataCol).cast("string").contains("#"), raise_error(
              concat(lit("packShards: stratum name contains the sub-stratum " +
                "separator '#' (collides with split-stratum keys when " +
                "maxStratumDocs is set): "), col(strataCol).cast("string"))))
              .otherwise(col(strataCol)).as("_census_key"),
            ceil(col("_n").cast("double") / cap).cast("int").as("_n_sub"))
        val sub = pmod(
          conv(substring(md5(concat(lit("sub|"), col(idCol).cast("string"))), 1, 8),
            16, 10).cast("long"),
          col("_n_sub").cast("long"))
        val keyed = df
          .join(broadcast(census), col(strataCol) === col("_census_key"))
          .withColumn("pack_stratum",
            when(col("_n_sub") <= 1, col(strataCol).cast("string"))
              .otherwise(concat(col(strataCol).cast("string"), lit("#"), sub)))
          .drop("_census_key", "_n_sub")
        packByKey(keyed, idCol, textCol, col("pack_stratum"), tokensOf)(budgetTokens)
    }
  }

  /** Training-mixture planning: given target mixture WEIGHTS per stratum
    * and a total token budget, compute each stratum's sampling rate —
    * `min(1, floor(weight × budget) / tokens_available)` — the step
    * between "I want 50% web, 30% books, 20% code" and the deterministic
    * sample that realizes it. Strata without a target weight are excluded
    * (rate 0 by omission). One tiny aggregation (rows = #strata); rates
    * over-subscribe gracefully: a stratum smaller than its target caps at
    * 1.0 and the mixture under-fills rather than double-sampling.
    *
    * @return (strataCol, tokens_available, weight, target_tokens, rate)
    */
  def mixturePlan(docs: DataFrame, textCol: String, strataCol: String,
                  targetWeights: Map[String, Double],
                  budgetTokens: Long,
                  tokensOf: Column => Column = WhitespaceTokens): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens=$budgetTokens must be >= 1")
    require(targetWeights.nonEmpty, "mixturePlan needs at least one target weight")
    targetWeights.foreach { case (s, w) =>
      require(w >= 0.0 && w <= 1.0, s"weight $w for stratum '$s' outside [0,1]") }
    val wsum = targetWeights.values.sum
    require(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum, expected 1.0")
    val weightCol = targetWeights.foldRight(lit(null).cast("double"): Column) {
      case ((stratum, w), alt) =>
        when(col(strataCol) === stratum, lit(w)).otherwise(alt)
    }
    docs
      .groupBy(col(strataCol))
      .agg(sum(tokensOf(col(textCol))).as("tokens_available"))
      .withColumn("weight", weightCol)
      .where(col("weight").isNotNull)
      .withColumn("target_tokens",
        floor(col("weight") * budgetTokens).cast("long"))
      .withColumn("rate",
        least(lit(1.0), col("target_tokens") / col("tokens_available")))
  }

  /** A COLUMN rate → fixed-width lowercase hex threshold (string order ==
    * unsigned numeric order, the stratifiedSample convention). Shared
    * across every bucket-threshold sampler in the package ([[UrlOps]]'s
    * approximate hostCap included) so the engine-portable encoding can
    * never drift between copies. */
  private[operators] def hexThr(rate: Column): Column =
    lpad(lower(conv(
      least(floor(rate * lit(4294967296L)), lit(4294967295L))
        .cast("long").cast("string"), 10, 16)), 8, "0")

  private[operators] def bucketOf(idCol: String, salt: String): Column =
    substring(md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 8)

  /** Realize a [[mixturePlan]]: the same deterministic md5-bucket rule as
    * [[stratifiedSample]], but thresholds come from the PLAN's rate column
    * (broadcast — rows = #strata) instead of a literal map, so plan and
    * application can live in different jobs. Map-side after the broadcast:
    * the corpus never shuffles. */
  def mixtureSample(docs: DataFrame, idCol: String, strataCol: String,
                    plan: DataFrame, salt: String = "mix"): DataFrame =
    docs
      .join(broadcast(plan.select(col(strataCol).as("_mix_key"), col("rate"))),
        col(strataCol) === col("_mix_key"))
      .withColumn("sample_bucket", bucketOf(idCol, salt))
      // rate >= 1.0 keeps every row EXACTLY (a capped ffffffff threshold
      // would still drop a bucket of exactly ffffffff — strict compare);
      // rate <= 0 keeps nothing — without the guard, floor of a negative
      // rate × 2^32 runs through conv() as unsigned 64-bit and lpad
      // TRUNCATES the 16-char result to 'ffffffff', keeping ~everything
      .where(col("rate") >= 1.0 ||
        (col("rate") > 0 && col("sample_bucket") < hexThr(col("rate"))))
      .drop("_mix_key", "rate")

  /** Importance (quality-weighted) sampling: keep each doc with
    * probability `min(1, weight)` where the weight is a PER-DOCUMENT
    * column — classifier score, language confidence, any [0, ∞) signal —
    * the GPT-3-style quality-proportional corpus reweighting. Same
    * deterministic md5-bucket acceptance as [[stratifiedSample]], so the
    * kept set is reproducible and changing one doc's weight never
    * reshuffles another's fate. Pure map-side.
    *
    * Determinism note for cross-engine use: derive the weight through
    * `round(_, 6)` first when it comes from float math (sigmoid etc.) —
    * the threshold multiplies it by 2^32, so a last-ulp difference could
    * flip a boundary bucket (the gate query does exactly this). */
  def importanceSample(docs: DataFrame, idCol: String, weightCol: String,
                       salt: String = "imp"): DataFrame =
    docs
      .withColumn("sample_bucket", bucketOf(idCol, salt))
      // weight <= 0 (a raw logit, a buggy signal) keeps NOTHING — the
      // min(1, max(0, w)) clamp; see mixtureSample for why the guard is
      // load-bearing and not just hygiene
      .where(col(weightCol) >= 1.0 ||
        (col(weightCol) > 0 && col("sample_bucket") < hexThr(col(weightCol))))

  private def packByKey(df: DataFrame, idCol: String, textCol: String,
                        key: Column, tokensOf: Column => Column)(
                        budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokensOf(col(textCol)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        floor((col("_cum") - col("n_tokens")) / budgetTokens).cast("long"))
      // where this doc's tokens START inside its shard when shard members
      // concatenate in id order — the seek offset a trainer needs; in
      // [0, budget) for every doc except a shard's overflowing last one
      .withColumn("shard_offset",
        col("_cum") - col("n_tokens") - col("shard_id") * budgetTokens)
      .drop("_cum")
  }
}
