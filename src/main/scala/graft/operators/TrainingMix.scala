package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus → training-mixture pipeline END TO END, as one composition
  * of individually-verified operators:
  *
  *   [[Curate.curate]] (quality / language / exact-dup / near-dup)
  *     → [[CorpusOps.decontaminate]] (drop docs leaking eval n-grams)
  *     → optional [[QualityClassifier]] gate (learned filter over the
  *       heuristic signals, `lrModel`/`minLrScore`)
  *     → optional CCNet perplexity gate (`ccnetLangCol`: the per-language
  *       'tail' bucket dropped via the window-free approximate split)
  *     → optional [[TextAnalysis.dedupSubstrings]] (`substringWindow`:
  *       duplicated token runs removed before availability is counted)
  *     → optional [[TextAnalysis.chunkDocs]] (`chunking`: the mixture is
  *       planned/sampled/packed over training-sized chunks, ids become
  *       "docId#chunkId")
  *     → [[CorpusOps.mixturePlan]] + [[CorpusOps.mixtureSample]]
  *       (target weights + token budget → deterministic per-stratum sample)
  *     → [[CorpusOps.packShards]] (token-budget shards, giant strata
  *       pre-split; `tokensOf` optionally counts real BPE subwords)
  *     → [[publish]] (parquet partitioned by (stratum, shard)).
  *
  * This is the switchover story for a training-data user: every stage is
  * the library operator they would call individually, so the composition
  * adds sequencing, not semantics. Scale shape = the sum of its parts:
  * each stage shrinks the next stage's input, the eval side broadcasts,
  * the mixture plan broadcasts. The shuffles the composition itself owns
  * are the id-keyed verdict/gate joins (curation verdicts, contaminated
  * ids, ccnet tail ids — each joins the corpus against a SHRUNKEN id
  * relation, AQE's broadcast case in practice); chunking threads its
  * columns map-side (carryCols) and adds none.
  */
object TrainingMix {

  /** Pipeline knobs, grouped per stage. `weights` must sum to 1; strata
    * absent from it are excluded from the mixture (rate 0). `tokensOf`
    * is the budget unit for BOTH the mixture plan and shard packing —
    * default whitespace tokens; pass a BPE counter
    * (`c => size(TextFunctions.bpeTokens(c, merges)).cast("long")`) to
    * budget by real subword counts. */
  final case class Config(
      minQuality: Double = 0.5,
      lang: Option[String] = Some("en"),
      jaccardThreshold: Double = 0.8,
      decontamN: Int = 3,
      decontamMinOverlap: Int = 2,
      weights: Map[String, Double],
      budgetTokens: Long,
      shardTokens: Long,
      maxStratumDocs: Option[Long] = None,
      tokensOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        CorpusOps.WhitespaceTokens,
      // optional R8 stages: a learned quality classifier gate (docs
      // scoring below minLrScore drop after curation), and exact
      // substring dedup (duplicated >=substringWindow-token runs removed
      // BEFORE the mixture is planned, so token availability counts only
      // surviving content)
      lrModel: Option[QualityClassifier.Model] = None,
      minLrScore: Double = 0.5,
      substringWindow: Option[Int] = None,
      // optional R8 continuation stages: CCNet perplexity gating (drop
      // the per-language 'tail' bucket — most corpus-atypical third —
      // via the window-free approximate split; value = the language
      // column name), and token-window chunking ((chunkTokens, overlap))
      // so the mixture is planned, sampled and packed over
      // training-sized chunks instead of whole documents
      ccnetLangCol: Option[String] = None,
      chunking: Option[(Int, Int)] = None)

  /** The mixture plan (tiny, one row per stratum) plus the packed sample
    * ready for [[publish]]. */
  final case class Mixture(plan: DataFrame, packed: DataFrame)

  /** Run the pipeline. `eval` (when given) is the benchmark set to
    * decontaminate against; docs sharing ≥ `decontamMinOverlap` distinct
    * `decontamN`-grams with ANY eval doc are dropped before the mixture
    * is planned, so contaminated tokens never count toward availability. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            strataCol: String, cfg: Config,
            eval: Option[DataFrame] = None,
            evalIdCol: String = "doc_id",
            evalTextCol: String = "text"): Mixture = {
    val verdicts = Curate.curate(docs, idCol, textCol,
      cfg.minQuality, cfg.lang, cfg.jaccardThreshold)
    val kept = docs.join(
      verdicts.where(col("kept")).select(col(idCol)), Seq(idCol))
    val cleared = eval match {
      case Some(ev) =>
        // no forced broadcast: the contaminated-id set is usually tiny but
        // corpus-bounded, not schema-bounded — let AQE pick broadcast when
        // the runtime size allows and fall back to a shuffled anti-join
        // when it doesn't (a forced hint OOMs the driver at the extreme)
        val contaminated = CorpusOps.decontaminate(kept, ev, idCol, textCol,
            evalIdCol, evalTextCol, cfg.decontamN, cfg.decontamMinOverlap)
          .select(col(idCol)).distinct()
        kept.join(contaminated, Seq(idCol), "left_anti")
      case None => kept
    }
    val classed = cfg.lrModel match {
      case Some(m) =>
        // features come from the quality signals; score map-side, gate,
        // and return to the caller's schema. The caller's columns ride
        // inside ONE struct while signals compute, so quality()'s
        // withColumn can never REPLACE a caller column sharing a signal
        // name (n_words, quality_score, ...) — still a pure projection,
        // zero shuffles
        val packed = cleared.select(
          struct(cleared.columns.map(col): _*).as("_orig"), col(textCol))
        QualityClassifier.score(TextAnalysis.quality(packed, textCol), m)
          .where(col("lr_quality") >= cfg.minLrScore)
          .select(col("_orig.*"))
      case None => cleared
    }
    val gated = cfg.ccnetLangCol match {
      case Some(langCol) =>
        // drop the per-language perplexity TAIL (most corpus-atypical
        // third) — the CCNet recipe, on the window-free scale path; the
        // LM trains on the corpus as it stands post-filtering, which is
        // the CCNet convention (score against what you keep). ANTI-join
        // on the tail ids, not inner-join on the kept ones: a doc the
        // bucketing never scored (NULL language, empty text) must PASS
        // the gate, not silently vanish from the mixture
        classed.join(
          TextAnalysis.perplexityBucketsApprox(classed, idCol, textCol, langCol)
            .where(col("bucket_name") === "tail")
            .select(col(idCol)),
          Seq(idCol), "left_anti")
      case None => classed
    }
    val deduped = cfg.substringWindow match {
      case Some(w) =>
        // duplicated runs out before availability is counted; documents
        // keep their stratum and id, text becomes the surviving tokens in
        // ORIGINAL case (preserveCase: duplicate windows still key on
        // normalized tokens, but the published rebuild must not case-fold —
        // the same contract the chunking stage states with lowercase=false).
        // Whitespace runs/newlines do collapse (the rebuild space-joins
        // surviving tokens).
        gated.drop(textCol)
          .join(TextAnalysis.dedupSubstrings(gated, idCol, textCol, w,
              preserveCase = true)
            .select(col(idCol), col("clean_text").as(textCol)), Seq(idCol))
      case None => gated
    }
    val units = cfg.chunking match {
      case Some((chunkTokens, overlap)) =>
        // training-sized units: ids become "docId#chunkId" (string — the
        // downstream md5 sampling/packing keys on the id AS A STRING
        // anyway). Stratum and every other caller column ride the chunk
        // rows map-side (carryCols — no doc-grain re-join shuffle), and
        // case is PRESERVED (lowercase = false): this stage
        // re-granularizes, it must not normalize what gets published.
        // Whitespace runs/newlines do collapse (chunks are space-joined
        // tokens) — the chunkDocs contract.
        val carried = deduped.columns.filterNot(c => c == idCol || c == textCol)
        TextAnalysis.chunkDocs(deduped, idCol, textCol, chunkTokens, overlap,
            carryCols = carried.toSeq, lowercase = false)
          .select(
            concat(col(idCol).cast("string"), lit("#"),
              col("chunk_id").cast("string")).as(idCol) +:
              col("chunk_text").as(textCol) +:
              carried.map(col): _*)
      case None => deduped
    }
    val plan = CorpusOps.mixturePlan(units, textCol, strataCol,
      cfg.weights, cfg.budgetTokens, cfg.tokensOf)
    val sampled = CorpusOps.mixtureSample(units, idCol, strataCol, plan)
    val packed = CorpusOps.packShards(sampled, idCol, textCol, strataCol,
      cfg.shardTokens, cfg.maxStratumDocs, cfg.tokensOf)
    Mixture(plan, packed)
  }

  /** Land the packed mixture as parquet partitioned by (stratum, shard) —
    * a trainer reads one shard directory per task. A publish is always the
    * FULL mixture, so the overwrite is static (whole `outPath` replaced):
    * dynamic partition overwrite would leave stale (stratum, shard)
    * directories behind when a re-publish yields FEWER shards per stratum
    * (smaller corpus after new decontamination, larger `shardTokens`, or a
    * changed `maxStratumDocs` renaming `pack_stratum` keys) — and a
    * trainer reading the path would silently include dropped or
    * contaminated documents. Output therefore always equals exactly the
    * mixture published last, and no session conf is touched. Uses
    * `pack_stratum` when [[CorpusOps.packShards]] pre-split a giant
    * stratum, the plain stratum column otherwise. */
  def publish(mix: Mixture, strataCol: String, outPath: String): Unit = {
    val partCol =
      if (mix.packed.columns.contains("pack_stratum")) "pack_stratum" else strataCol
    mix.packed.write.mode("overwrite")
      .partitionBy(partCol, "shard_id")
      .parquet(outPath)
  }
}
