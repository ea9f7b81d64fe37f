package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.{Sq8Dot, Sq8Encode}

/** 8-bit scalar-quantized ANN — the fourth compression point in the ANN
  * family, between raw brute force and PQ: unit-normalized coordinates
  * are uniformly quantized to one byte each (fixed [-1, 1] range — no
  * training), so the corpus-side scan reads 64 B codes instead of 256 B
  * floats (4×; PQ reaches 8-16× but needs k-means codebooks and pays
  * codebook-local error). Probes are asymmetric: the raw normalized
  * query scores against each code's reconstruction, shortlist by
  * approximate dot, exact re-rank from the raw vectors — reported
  * similarities are exact, quantization costs only shortlist recall,
  * and the per-coordinate error is bounded by the step (1/255), NOT
  * data-dependent.
  *
  * Because the quantizer is data-independent and every loop is
  * sequential double arithmetic, the ENTIRE pipeline — encode, approx
  * shortlist, exact re-rank — is reproducible in DuckDB SQL: `ann_sq`
  * is the family's one hash-oracled quantized query (the k-means
  * families are rows-only by necessity).
  *
  * Scale shape: encode is one map pass ([[Sq8Encode]], full codegen);
  * the probe is a codes-only scan × broadcast queries with the
  * [[graft.functions.TopKRows]] bounded-heap shortlist (≤ k·factor rows
  * per query per task); the re-rank fetch touches raw vectors for
  * queries×shortlist rows only. Composes with IVF exactly like PQ if
  * cell-pruning is also wanted.
  */
object Sq {

  import graft.functions.VectorOps.{dotCol, unitNorm}

  private[operators] def encodeCol(vn: Column): Column =
    Bridge.column(Sq8Encode(Bridge.expression(vn)))

  private[operators] def dotCol8(code: Column, qn: Column): Column =
    Bridge.column(Sq8Dot(Bridge.expression(code), Bridge.expression(qn)))

  /** Encode the corpus: `(id, sq_code array<tinyint>)` — one map pass,
    * no fit. This narrow relation IS the persisted index. */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), encodeCol(unitNorm(col(vecCol))).as("sq_code"))

  /** Approx shortlist + exact re-rank (the PQ deployment shape, minus
    * training): shortlist k·shortlistFactor per query by approximate
    * dot over codes, fetch+rescore those raw vectors exactly. Output
    * shape matches [[Similarity.bruteForceTopK]]. */
  def topKRerank(codes: DataFrame, idCol: String,
                 corpus: DataFrame, vecCol: String,
                 queries: DataFrame, qIdCol: String, qVecCol: String,
                 k: Int, shortlistFactor: Int = 5): DataFrame = {
    require(shortlistFactor >= 1, s"shortlistFactor=$shortlistFactor")
    val q = queries.select(col(qIdCol), unitNorm(col(qVecCol)).as("_qn"))
    val scored = codes.crossJoin(broadcast(q))
      .where(col(idCol) =!= col(qIdCol))
      .withColumn("sq_dot", round(dotCol8(col("sq_code"), col("_qn")), 6))
      .select(col(qIdCol), col(idCol), col("sq_dot"))
    val shortlist = Analytics.topKPerGroupAgg(scored, Seq(qIdCol), "sq_dot",
        idCol, k * shortlistFactor)
      .select(col(qIdCol), col(idCol))
    val cn = corpus.select(col(idCol), unitNorm(col(vecCol)).as("_vn"))
    val qn = queries.select(col(qIdCol), unitNorm(col(qVecCol)).as("_qn"))
    val rescored = cn.join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qn), Seq(qIdCol))
      .withColumn("cos_sim", round(dotCol(col("_qn"), col("_vn")), 6))
      .select(col(qIdCol), col(idCol), col("cos_sim"))
    Analytics.topKPerGroupAgg(rescored, Seq(qIdCol), "cos_sim", idCol, k)
  }

  /** One-shot encode + shortlist + re-rank (the `ann_sq` gate shape). */
  def topK(corpus: DataFrame, queries: DataFrame,
           idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
           k: Int, shortlistFactor: Int = 5): DataFrame =
    topKRerank(encode(corpus, idCol, vecCol), idCol, corpus, vecCol,
      queries, qIdCol, qVecCol, k, shortlistFactor)
}
