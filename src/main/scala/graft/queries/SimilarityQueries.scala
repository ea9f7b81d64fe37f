package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hyperplanes
import graft.operators.{Ivf, IvfPq, Opq, PcaAnn, Pq, Similarity, Sq}

/** Embedding similarity queries + DuckDB oracles (SURVEY.md §2 #23-25).
  * The k-means families emit contract verdicts (quantizers are not
  * DuckDB-reproducible; see [[ContractGate]] and [[annContract]]);
  * `ann_lsh` is fully oracled — the SQL re-derives the seeded hyperplane
  * signatures, multi-probe expansion, bucket join, and rescore.
  */
object SimilarityQueries {

  val K = 10
  val QueryCount = 8
  val NeardupThreshold = 0.35
  val Dim = 64
  val LshTables = 12
  val LshPlanes = 4
  val LshSeed = 42L

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private def queriesDf(e: DataFrame): DataFrame =
    e.where(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.bruteForceTopK(e, queriesDf(e), "vec_id", "embedding",
        "q_id", "q_vec", K)
      .orderBy("q_id", "rank")
  }

  /** SQ8 scalar-quantized ANN — the one HASH-ORACLED quantized query in
    * the family: the fixed-range uniform quantizer is data-independent
    * and every loop is sequential double arithmetic, so the DuckDB
    * oracle re-derives the ENTIRE pipeline (normalize → byte codes →
    * asymmetric approx shortlist → exact re-rank) value-for-value. The
    * k-means families (IVF/PQ/IVF-PQ) are contract-verdict gates. */
  def annSq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Sq.topK(e, queriesDf(e), "vec_id", "embedding", "q_id", "q_vec", K)
      .orderBy("q_id", "rank")
  }

  // ---- contract verdicts for the k-means ANN family ----------------------
  // The quantizer internals are not DuckDB-reproducible, so these gates
  // (R17 verdict item 5) emit machine-checked contract verdicts instead
  // of `no_oracle`: the operator runs in full, then its result is judged
  // against the exact brute-force reference and an all-pass literal
  // oracle hash-matches iff every contract held. See [[ContractGate]].

  /** Exact neighbor sets (q_id → top-K vec_ids), built once per
    * (session, corpus) — the recall reference for every ANN contract.
    * Bounded collect: QueryCount·K rows. */
  private val exactTopKCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Map[Long, Set[Long]]]

  private def exactTopK(s: SparkSession, dir: String): Map[Long, Set[Long]] =
    exactTopKCache.getOrElseUpdate((s, dir),
      annTopK(s, dir).select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet })

  /** Calibrated recall floors: (mean, min-per-query). Quantizer seeds are
    * fixed, so recall per corpus is deterministic — tools/RecallScan
    * measured sf0.001/0.01/0.1 and each floor sits a margin under the
    * worst sf (e.g. IVF nProbe=4/16 measured mean 0.60–0.69, min
    * 0.40–0.50 → floors 0.55/0.30). */
  private val IvfFloors = (0.55, 0.30)
  private val PqFloors = (0.80, 0.60)
  private val OpqFloors = (0.85, 0.70)
  private val PcaFloors = (0.30, 0.10)

  /** The shared ANN result contract: shape (K rows per query, contiguous
    * ranks, ids distinct / in-corpus / ≠ query), EXACTNESS of the
    * re-ranked cosines (recomputed from the raw vectors, ≤2e-6 of the
    * reported round-6 value — the "exact re-rank" claim, checked), the
    * (cos DESC, vec_id ASC) order pin, and recall@K vs [[exactTopK]] at
    * the method's calibrated floors. */
  private def annContract(s: SparkSession, dir: String, result: DataFrame,
                          floors: (Double, Double)): DataFrame = {
    val (meanFloor, minFloor) = floors
    val rows = result
      .select(col("q_id").cast("long"), col("vec_id").cast("long"),
        col("cos_sim").cast("double"), col("rank").cast("int"))
      .collect() // bounded: ≤ QueryCount·K rows
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    val ids = (rows.map(_._1) ++ rows.map(_._2)).distinct.toSeq
    val vecs: Map[Long, Array[Double]] = emb(s, dir)
      .where(col("vec_id").isin(ids: _*))
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect() // bounded: ≤ QueryCount·(K+1) rows
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = exactTopK(s, dir)
    val recalls = byQ.map { case (q, rs) =>
      rs.count(r => exact.getOrElse(q, Set.empty)(r._2)).toDouble / K }.toSeq
    val kRows = rows.length == QueryCount * K && byQ.size == QueryCount &&
      byQ.values.forall(_.length == K)
    val idsOk = rows.forall { case (q, v, _, _) => v != q && vecs.contains(v) } &&
      byQ.values.forall(rs => rs.map(_._2).distinct.length == rs.length)
    val ranksOk = byQ.values.forall(_.map(_._4).sorted.toSeq == (1 to K))
    val ordered = byQ.values.forall { rs =>
      rs.sortBy(_._4).toSeq.sliding(2).forall {
        case Seq((_, v1, c1, _), (_, v2, c2, _)) => c1 > c2 || (c1 == c2 && v1 < v2)
        case _ => true
      }
    }
    val cosErr =
      if (!idsOk) Double.MaxValue
      else if (rows.isEmpty) 0.0
      else rows.iterator.map { case (q, v, c, _) =>
        math.abs(cos(vecs(q), vecs(v)) - c) }.max
    val meanR = recalls.sum / math.max(1, recalls.size)
    val minR = if (recalls.isEmpty) 0.0 else recalls.min
    ContractGate.verdicts(s, Seq(
      ("k_rows", kRows, s"rows=${rows.length} queries=${byQ.size}"),
      ("ids_distinct_in_corpus", idsOk, "dup/self/unknown vec_id in results"),
      ("ranks_contiguous", ranksOk, "ranks not 1..K per query"),
      ("order_cos_desc_id_asc", ordered, "rank order violates (cos DESC, vec_id)"),
      ("cos_exact_rerank", cosErr <= 2e-6, ContractGate.obs(cosErr)),
      (f"recall_mean_ge_$meanFloor%.2f", meanR >= meanFloor, ContractGate.obs(meanR)),
      (f"recall_min_ge_$minFloor%.2f", minR >= minFloor, ContractGate.obs(minR))))
  }

  /** [[annContract]]'s all-pass literal oracle. */
  private def annOracle(floors: (Double, Double)): String =
    ContractGate.oracle(Seq(
      "k_rows", "ids_distinct_in_corpus", "ranks_contiguous",
      "order_cos_desc_id_asc", "cos_exact_rerank",
      f"recall_mean_ge_${floors._1}%.2f", f"recall_min_ge_${floors._2}%.2f"))

  def embNeardup(s: SparkSession, dir: String): DataFrame =
    Similarity.neardupPairs(emb(s, dir), "vec_id", "embedding", NeardupThreshold)
      .orderBy("i", "j")

  /** The 100 TB twin of [[embNeardup]]: bucket-local LSH candidates + exact
    * rescore. Output ⊆ the exact pair set with identical `cos_sim`; the
    * DuckDB oracle re-derives the seeded ±1 hyperplane signatures in SQL
    * ([[Hyperplanes.signatureSql]]) so the gate checks the WHOLE procedure
    * (signatures, bucket join, rescore, threshold), not just the rescore. */
  def embNeardupLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.neardupPairsLsh(emb(s, dir), "vec_id", "embedding",
        NeardupThreshold, LshTables, LshPlanes, Dim, LshSeed)
      .orderBy("i", "j")

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.lshTopK(e, queriesDf(e), "vec_id", "embedding",
        "q_id", "q_vec", K, nTables = 12, planesPerTable = 4, dim = 64,
        multiProbe = true)
      .orderBy("q_id", "rank")
  }

  /** IVF ANN, one-shot, judged by [[annContract]] (the k-means quantizer
    * is not DuckDB-reproducible, so the gate emits hash-oracled contract
    * verdicts; recall vs brute force also asserted in SimilaritySpec).
    * Trains per execution — the honest "cold" cost; the deployment shape
    * is [[annIvfProbe]]. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      Ivf.topK(e, queriesDf(e), "vec_id", "embedding", "q_id", "q_vec",
        K, nCells = 16, nProbe = 4),
      IvfFloors)
  }

  val IvfCells = 16
  val IvfSeed = 42L

  // Build-once index cache, keyed per (session, corpus dir): the 100 TB
  // deployment shape is "train + assign + persist the index once, probe it
  // per query batch" (Ivf.build scaladoc). Keying on the session too keeps
  // a stale persisted plan from leaking across SparkSessions in tests.
  private val ivfIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Ivf.Index]

  /** The session's built IVF index for `dir` — training + assignment +
    * materialization run on FIRST access only ([[Bench]] prewarms this
    * outside its timed region, the way a serving deployment builds the
    * index before opening the query path). DISK-BACKED ([[Fixtures]]):
    * the served relation is the saved cell-partitioned parquet, not
    * executor blocks — probe latency no longer depends on block
    * residency across a long sweep, and partition pruning on `cell` is
    * exactly the deployment read path. */
  def ivfIndex(s: SparkSession, dir: String): Ivf.Index =
    ivfIndexes.getOrElseUpdate((s, dir), {
      val built = Ivf.build(emb(s, dir), "vec_id", "embedding", IvfCells, IvfSeed)
      val p = Fixtures.tempDir("ivf")
      Ivf.save(built, s, p)
      built.unpersist()
      Ivf.load(s, p, "vec_id")
    })

  /** IVF ANN, probe-only — the build-once/probe-many half of [[annIvf]]:
    * same results (same quantizer seed), but the plan is a broadcast
    * equi-join on `cell` against the persisted index; no training job.
    * Judged by [[annContract]] like `ann_ivf` (same floors — probe and
    * cold share the quantizer seed, so they earn the same recall). */
  def annIvfProbe(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      Ivf.probe(ivfIndex(s, dir), queriesDf(e), "q_id", "q_vec", K, nProbe = 4),
      IvfFloors)
  }

  /** SemDeDup over the embeddings table: IVF-cell-local exact rescoring +
    * components, min-id canonical per semantic group. Judged by contract
    * verdicts (the k-means quantizer is not DuckDB-reproducible):
    * exact-partition/canonical/edge-consistency checks below, hash-
    * oracled all-pass; SimilaritySpec checks the verdicts equal the
    * reference components of
    * (exact pairs ∩ co-celled) and that planted exact copies always
    * recall. Threshold 0.45, above `emb_neardup`'s 0.35: semantic dedup
    * targets REDUNDANT documents, not merely related ones (SemDeDup's
    * published operating range is the high-similarity end), and a sparser
    * edge graph is what keeps component iteration cheap at scale — while
    * still FIRING on this corpus (14 co-celled-or-not pairs at sf0.01,
    * 144 at sf0.1; 0.6 would select zero, a gate where the lever never
    * bites). Runs off the session's built index ([[ivfIndex]], the
    * `ann_ivf_probe` precedent): one persisted quantizer serves ANN
    * probes AND semantic dedup, and its cell-partitioned relation makes
    * the self-join exchange-free. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.dotCol
    val idx = ivfIndex(s, dir)
    val verdictRows = Similarity.semanticDedupIndexed(idx, threshold = 0.45)
      .localCheckpoint() // read 6× by the contract aggregates below
    val n = emb(s, dir).count()
    // ONE aggregation job answers every row-local contract quantity —
    // total rows, distinct ids, canonical>member violations, dup count —
    // over the checkpointed verdict relation (was four separate count
    // jobs; the quantities and verdicts are unchanged)
    val vAgg = verdictRows.agg(
      count(lit(1)).as("_total"),
      count_distinct(col("vec_id")).as("_nids"),
      coalesce(sum(when(col("canonical_id") > col("vec_id"), 1L)
        .otherwise(0L)), lit(0L)).as("_cam"),
      coalesce(sum(when(col("is_dup"), 1L).otherwise(0L)), lit(0L)).as("_dups"))
      .head()
    val total = vAgg.getLong(0)
    val nIds = vAgg.getLong(1)
    // the operator's OWN edge definition, recomputed with the same fused
    // kernel + round-6 threshold — bit-identical edge set by construction
    val a = idx.assigned.select(col("cell"), col(idx.idCol).as("i"), col("_vn").as("va"))
    val b = idx.assigned.select(col("cell"), col(idx.idCol).as("j"), col("_vn").as("vb"))
    val edges = a.join(b, Seq("cell")).where(col("i") < col("j"))
      .where(round(dotCol(col("va"), col("vb")), 6) >= 0.45)
      .select("i", "j").localCheckpoint()
    val canon = verdictRows.select(col("vec_id"), col("canonical_id"))
    val crossCluster = edges
      .join(canon.toDF("i", "ci"), Seq("i"))
      .join(canon.toDF("j", "cj"), Seq("j"))
      .where(col("ci") =!= col("cj")).count()
    val canonAboveMember = vAgg.getLong(2)
    val canonNotKept = verdictRows.select(col("canonical_id").as("vec_id")).distinct()
      .join(verdictRows.where(!col("is_dup")).select("vec_id"), Seq("vec_id"), "left_anti")
      .count()
    val endpoints = edges.select(col("i").as("vec_id"))
      .union(edges.select(col("j").as("vec_id"))).distinct()
    val causeless = verdictRows.where(col("is_dup"))
      .join(endpoints, Seq("vec_id"), "left_anti").count()
    val dups = vAgg.getLong(3)
    val edgeCount = edges.count()
    ContractGate.verdicts(s, Seq(
      ("partition_exact", total == n && nIds == n, s"rows=$total ids=$nIds corpus=$n"),
      ("canonical_le_members", canonAboveMember == 0, s"violations=$canonAboveMember"),
      ("canonical_kept", canonNotKept == 0, s"violations=$canonNotKept"),
      ("edges_never_cross_clusters", crossCluster == 0, s"violations=$crossCluster"),
      ("every_dup_has_cause", causeless == 0, s"violations=$causeless"),
      ("dups_iff_edges", (dups > 0) == (edgeCount > 0), s"dups=$dups edges=$edgeCount")))
  }

  private val semanticDedupOracle: String = ContractGate.oracle(Seq(
    "partition_exact", "canonical_le_members", "canonical_kept",
    "edges_never_cross_clusters", "every_dup_has_cause", "dups_iff_edges"))

  /** Semantic decontamination: eval = every 50th vector (the decontaminate
    * carve), self-pairs excluded; threshold 0.45 — the corpus's real
    * near-neighbor band (0.6 selects nothing here, 0.35 is `emb_neardup`'s
    * related-pairs band). */
  def deconSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.decontaminateSemantic(e, e.where(col("vec_id") % 50 === 0),
        "vec_id", "embedding", "vec_id", "embedding", threshold = 0.45)
      .where(col("vec_id") =!= col("eval_id"))
      .orderBy("vec_id", "eval_id")
  }

  val PqM = 16
  val PqKsub = 64

  /** Product-quantization ANN with exact re-rank (contract-verdict gate:
    * the per-subspace k-means codebooks are not DuckDB-reproducible; PqSpec
    * pins the ADC = exact-distance-to-reconstruction identity, encode
    * determinism, and recall vs the brute-force oracle — 0.975 at this
    * config). The shortlist scan reads m=16 smallint codes per corpus row
    * (32 B vs 256 B of floats, 8×); full vectors are fetched only for the
    * queries×shortlist re-rank — the 100 TB claim. */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      Pq.topK(e, queriesDf(e), "vec_id", "embedding", "q_id", "q_vec",
        K, m = PqM, ksub = PqKsub),
      PqFloors)
  }

  // Build-once PQ index cache (codebooks + persisted codes), the exact
  // ivfIndexes pattern: a deployment trains codebooks and encodes the
  // corpus once, then answers probe batches against the narrow code
  // relation. Bench prewarms this outside its timed region.
  private val pqIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Pq.Codebooks, DataFrame)]

  def pqIndex(s: SparkSession, dir: String): (Pq.Codebooks, DataFrame) =
    pqIndexes.getOrElseUpdate((s, dir), {
      val e = emb(s, dir)
      val cb = Pq.fit(e, "embedding", PqM, PqKsub, seed = 42L)
      // disk-backed ([[Fixtures]] discipline): the code relation is
      // written once and served from parquet — probes never re-trigger
      // training AND never depend on executor-block residency
      val codesPath = Fixtures.tempDir("pq") + "/codes"
      Pq.encode(e, "vec_id", "embedding", cb).write.parquet(codesPath)
      (cb, s.read.parquet(codesPath))
    })

  /** IVF-PQ (contract-verdict gate like its two parents): coarse cells bound the
    * candidates, residual PQ codes bound the bytes per candidate, exact
    * re-rank bounds the error — the published billion-scale composition.
    * IvfPqSpec pins the two-level ADC identity, probed-cell locality,
    * recall (0.65 at nProbe=4/16), and the no-all-pairs plan. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      IvfPq.topK(e, queriesDf(e), "vec_id", "embedding", "q_id", "q_vec",
        K, nCells = IvfCells, nProbe = 4, m = PqM, ksub = PqKsub),
      IvfFloors)
  }

  // Build-once IVF-PQ index cache — the ivfIndexes/pqIndexes pattern.
  private val ivfPqIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), IvfPq.Index]

  def ivfPqIndex(s: SparkSession, dir: String): IvfPq.Index =
    ivfPqIndexes.getOrElseUpdate((s, dir), {
      val built = IvfPq.build(emb(s, dir), "vec_id", "embedding",
        nCells = IvfCells, m = PqM, ksub = PqKsub, seed = 42L)
      val p = Fixtures.tempDir("ivfpq")
      IvfPq.save(built, s, p)
      built.unpersist()
      IvfPq.load(s, p, "vec_id")
    })

  /** IVF-PQ, probe-only — the build-once/probe-many half of [[annIvfPq]]:
    * identical results (same quantizer seeds), no training jobs in the
    * plan. Contract-verdict gate like its parents; IvfPqSpec pins probe parity. */
  def annIvfPqProbe(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      IvfPq.probe(ivfPqIndex(s, dir), e, "embedding", queriesDf(e),
        "q_id", "q_vec", K, nProbe = 4),
      IvfFloors)
  }

  /** PQ ANN, probe-only — the build-once/probe-many half of [[annPq]]:
    * identical results (same codebook seed), but the plan is an ADC scan
    * of the persisted code relation + exact re-rank; no training jobs.
    * Contract-verdict gate like `ann_pq`; PqSpec asserts probe == cold path. */
  def annPqProbe(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val (cb, codes) = pqIndex(s, dir)
    annContract(s, dir,
      Pq.topKRerank(codes, cb, "vec_id", e, "embedding",
        queriesDf(e), "q_id", "q_vec", K),
      PqFloors)
  }

  /** OPQ ANN (Ge et al. 2013; contract-verdict gate like its PQ parent): a learned
    * orthonormal rotation decorrelates the subspaces before PQ — lower
    * quantization error at the SAME 32 B code size (the win is pinned
    * against an iters=0 ablation in OpqSpec). Cold path: driver-side
    * alternating fit on the bounded sample, fused rotate+encode map
    * pass, rotated-ADC bounded-heap shortlist, exact re-rank in the
    * ORIGINAL space (cosine is rotation-invariant). */
  def annOpq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      Opq.topK(e, queriesDf(e), "vec_id", "embedding", "q_id", "q_vec",
        K, m = PqM, ksub = PqKsub),
      OpqFloors)
  }

  private val opqIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Opq.Model, DataFrame)]

  def opqIndex(s: SparkSession, dir: String): (Opq.Model, DataFrame) =
    opqIndexes.getOrElseUpdate((s, dir), {
      val e = emb(s, dir)
      val model = Opq.fit(e, "embedding", PqM, PqKsub)
      // disk-backed via the operator's own save/load (id-clustered
      // codes; probes never re-trigger training, never depend on
      // executor-block residency)
      val p = Fixtures.tempDir("opq")
      Opq.save(model, Opq.encode(e, "vec_id", "embedding", model),
        "vec_id", s, p)
      Opq.load(s, p)
    })

  /** OPQ, probe-only — the build-once/probe-many half of [[annOpq]]:
    * identical results (same seed), no training jobs in the plan. */
  def annOpqProbe(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val (model, codes) = opqIndex(s, dir)
    annContract(s, dir,
      Opq.topKRerank(codes, model, "vec_id", e, "embedding",
        queriesDf(e), "q_id", "q_vec", K),
      OpqFloors)
  }

  /** PCA dims for the reduce-then-index path: 16 of 64 — the k at which
    * PcaSpec's planted-rank corpus keeps recall ≥0.9 while the index
    * stores 4× fewer bytes per vector. */
  val PcaDim = 16

  private val pcaAnnIndexes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), PcaAnn.Index]

  /** The session's built PCA+IVF index for `dir` — PCA fit + projection +
    * k-means + assignment run on FIRST access only (the [[ivfIndex]]
    * build-once/probe-many convention). */
  def pcaAnnIndex(s: SparkSession, dir: String): PcaAnn.Index =
    pcaAnnIndexes.getOrElseUpdate((s, dir), {
      val built = PcaAnn.build(emb(s, dir), "vec_id", "embedding",
        PcaDim, IvfCells, IvfSeed)
      val p = Fixtures.tempDir("pcaann")
      PcaAnn.save(built, s, p)
      built.unpersist()
      PcaAnn.load(s, p, "vec_id")
    })

  /** PCA-reduced IVF ANN, probe-only — the reduce-then-index deployment
    * [[graft.operators.Pca]]'s spectrum report exists for: shortlist in
    * the 16-dim principal subspace (4× smaller index, 4× cheaper dots),
    * exact re-rank in the original 64-dim space. Contract-verdict gate (k-means +
    * Jacobi eigenvectors are not DuckDB-reproducible); PcaAnnSpec pins
    * recall vs the unreduced IVF twin at matched nProbe plus exactness
    * of the reported cosines. */
  def annPcaProbe(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    annContract(s, dir,
      PcaAnn.probe(pcaAnnIndex(s, dir), e, "embedding", queriesDf(e),
        "q_id", "q_vec", K, nProbe = 4),
      PcaFloors)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk" -> (annTopK _),
    "ann_pca_probe" -> (annPcaProbe _),
    "ann_sq" -> (annSq _),
    "ann_opq" -> (annOpq _),
    "ann_opq_probe" -> (annOpqProbe _),
    "ann_pq" -> (annPq _),
    "ann_pq_probe" -> (annPqProbe _),
    "ann_ivfpq" -> (annIvfPq _),
    "ann_ivfpq_probe" -> (annIvfPqProbe _),
    "decon_semantic" -> (deconSemantic _),
    "emb_neardup" -> (embNeardup _),
    "emb_neardup_lsh" -> (embNeardupLsh _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_ivf_probe" -> (annIvfProbe _),
    "semantic_dedup" -> (semanticDedup _)
  )

  /** DuckDB re-derivation of [[embNeardupLsh]]: per-table signatures as
    * inline ±v[i] sums (bitwise-equal to the fused expression's sequential
    * fold), bucket equi-join, exact rescore, same threshold. */
  private def embNeardupLshOracle: String = {
    val tables = Hyperplanes.tables(LshTables, LshPlanes, Dim, LshSeed)
    val sigBranches = tables.zipWithIndex.map { case (planes, t) =>
      s"SELECT vec_id, v, $t AS tbl, ${Hyperplanes.signatureSql(planes, "v")} AS sig FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sigs AS (
       |$sigBranches
       |),
       |cand AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j,
       |    round(list_cosine_similarity(a.v, b.v), 6) AS cs
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT i, j, max(cs) AS cos_sim FROM cand
       |WHERE cs >= $NeardupThreshold
       |GROUP BY i, j ORDER BY i, j""".stripMargin
  }

  /** DuckDB re-derivation of [[annLsh]] (the whole procedure, like
    * [[embNeardupLshOracle]]): per-table signatures for the corpus; the
    * query side reuses them (queries ARE the vec_id < QueryCount corpus
    * rows) expanded by multi-probe — xor with 0 (the signature itself) and
    * each single-bit flip; bucket equi-join for distinct candidates; exact
    * rescore; per-query top-k. */
  private def annLshOracle: String = {
    val tables = Hyperplanes.tables(LshTables, LshPlanes, Dim, LshSeed)
    val sigBranches = tables.zipWithIndex.map { case (planes, t) =>
      s"SELECT vec_id, $t AS tbl, ${Hyperplanes.signatureSql(planes, "v")} AS sig FROM e"
    }.mkString("\nUNION ALL\n")
    val flips = (0 +: (0 until LshPlanes).map(1 << _)).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $QueryCount),
       |csigs AS (
       |$sigBranches
       |),
       |qprobe AS (
       |  SELECT vec_id AS q_id, tbl, xor(sig, f.f) AS sig
       |  FROM csigs CROSS JOIN (SELECT unnest($flips) AS f) f
       |  WHERE vec_id < $QueryCount),
       |cand AS (
       |  SELECT DISTINCT p.q_id, c.vec_id
       |  FROM qprobe p JOIN csigs c ON p.tbl = c.tbl AND p.sig = c.sig
       |  WHERE c.vec_id <> p.q_id)
       |SELECT q_id, vec_id, cos_sim, rank FROM (
       |  SELECT cand.q_id, cand.vec_id,
       |    round(list_cosine_similarity(q.qv, e.v), 6) AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY cand.q_id
       |      ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC, cand.vec_id) AS INT) AS rank
       |  FROM cand JOIN q ON cand.q_id = q.q_id JOIN e ON cand.vec_id = e.vec_id)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB re-derivation of [[annSq]] — the WHOLE quantized pipeline:
    * sequential-sum unit normalization (bitwise the [[graft.functions
    * .UnitNormalize]] kernel), fixed-range byte codes
    * (`least(255, greatest(0, round((x+1)·127.5)))`, round half-away on
    * both engines), asymmetric approx dot as an inline left-associative
    * 64-term sum (the [[Hyperplanes.planeDotSql]] parity discipline),
    * top-k·5 shortlist, exact rescore, top-k. */
  private def annSqOracle: String = {
    val sumSq = (1 to Dim).map(i => s"v[$i]*v[$i]").mkString("(0.0 + ", " + ", ")")
    val dot = (1 to Dim).map(i => s"q.qn[$i]*d.xh[$i]").mkString("(0.0 + ", " + ", ")")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt($sumSq) AS nrm FROM e),
       |en AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS vn FROM n),
       |codes AS (SELECT vec_id,
       |  list_transform(vn, x -> least(255.0, greatest(0.0, round((x + 1.0) * 127.5)))) AS c
       |  FROM en),
       |dec AS (SELECT vec_id, list_transform(c, x -> x / 127.5 - 1.0) AS xh FROM codes),
       |q AS (SELECT vec_id AS q_id, vn AS qn FROM en WHERE vec_id < $QueryCount),
       |approx AS (
       |  SELECT q.q_id, d.vec_id, round($dot, 6) AS sq_dot
       |  FROM q CROSS JOIN dec d WHERE d.vec_id <> q.q_id),
       |short AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sq_dot DESC, vec_id) AS r FROM approx)
       |  WHERE r <= ${K * 5})
       |SELECT q_id, vec_id, cos_sim, rank FROM (
       |  SELECT s.q_id, s.vec_id,
       |    round(list_cosine_similarity(qe.v, ce.v), 6) AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY s.q_id
       |      ORDER BY round(list_cosine_similarity(qe.v, ce.v), 6) DESC, s.vec_id) AS INT) AS rank
       |  FROM short s JOIN e ce ON s.vec_id = ce.vec_id
       |               JOIN e qe ON qe.vec_id = s.q_id)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "ann_sq" -> annSqOracle,
    "ann_lsh" -> annLshOracle,
    // contract gates (operator output not DuckDB-reproducible; verdicts
    // are — see ContractGate)
    "ann_ivf" -> annOracle(IvfFloors),
    "ann_ivf_probe" -> annOracle(IvfFloors),
    "ann_ivfpq" -> annOracle(IvfFloors),
    "ann_ivfpq_probe" -> annOracle(IvfFloors),
    "ann_pq" -> annOracle(PqFloors),
    "ann_pq_probe" -> annOracle(PqFloors),
    "ann_opq" -> annOracle(OpqFloors),
    "ann_opq_probe" -> annOracle(OpqFloors),
    "ann_pca_probe" -> annOracle(PcaFloors),
    "semantic_dedup" -> semanticDedupOracle,
    "decon_semantic" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, v AS evv FROM e WHERE vec_id % 50 = 0)
        |SELECT e.vec_id, ev.eval_id,
        |  round(list_cosine_similarity(e.v, ev.evv), 6) AS cos_sim
        |FROM e CROSS JOIN ev
        |WHERE round(list_cosine_similarity(e.v, ev.evv), 6) >= 0.45
        |  AND e.vec_id <> ev.eval_id
        |ORDER BY vec_id, eval_id""".stripMargin,
    "ann_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $QueryCount)
         |SELECT q_id, vec_id, cos_sim, rank FROM (
         |  SELECT q.q_id, e.vec_id,
         |    round(list_cosine_similarity(q.qv, e.v), 6) AS cos_sim,
         |    CAST(row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC, e.vec_id) AS INT) AS rank
         |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id)
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin,

    "emb_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT i, j, cos_sim FROM (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |    round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cos_sim >= $NeardupThreshold ORDER BY i, j""".stripMargin,

    "emb_neardup_lsh" -> embNeardupLshOracle
  )

  // bounded-lifetime contract (VERDICT r19 #4): every session cache here
  // is evictable through the central registry
  Fixtures.onClear { () =>
    exactTopKCache.clear(); ivfIndexes.clear(); pqIndexes.clear()
    ivfPqIndexes.clear(); opqIndexes.clear(); pcaAnnIndexes.clear()
  }
}
