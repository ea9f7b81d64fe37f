package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the published billion-scale ANN recipe (Jégou et al. 2011 §V:
  * coarse quantizer + product-quantized RESIDUALS), composing this repo's
  * two index families: [[Ivf]] bounds WHICH candidates are scored (nProbe
  * cells per query), [[Pq]] bounds the BYTES per candidate (m smallint
  * codes). The probe plan touches nProbe cells' worth of 32 B codes —
  * at 100 TB neither the full corpus nor full-width vectors enter any
  * exchange or scan.
  *
  * Residual encoding is what makes the composition better than either part
  * alone: within a cell, vectors share their centroid's location, so codes
  * spend their bits on the (much smaller) displacement `x − c(x)` instead
  * of re-describing the cell's position — one shared codebook set across
  * cells, trained on pooled residuals (the paper's memory/accuracy trade).
  *
  * ADC here is exact to the TWO-LEVEL reconstruction: for x in cell c,
  * `adc(q, x) = ‖(q − ctr_c) − decode(code_x)‖²
  *            = ‖q − (ctr_c + decode(code_x))‖²` — pinned in IvfPqSpec.
  * The final exact re-rank fetches raw vectors for queries×shortlist rows
  * only, so reported similarities are never approximate.
  */
object IvfPq {

  import graft.functions.VectorOps.{dotCol, unitNorm}

  /** Built index: `(id, cell, pq_code)` + cell centroids + residual
    * codebooks. The relation is code-narrow — vectors live only in the
    * source table, touched at re-rank. */
  final case class Index private[IvfPq](assigned: DataFrame,
                                        centers: Array[Array[Double]],
                                        cb: Pq.Codebooks,
                                        idCol: String) {
    def unpersist(): Unit = assigned.unpersist()
  }

  private def centersDf(spark: SparkSession,
                        centers: Array[Array[Double]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = centers.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }.toSeq.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_ctr",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** Train coarse cells + residual codebooks, encode every row, persist the
    * code relation pre-shuffled by cell (the [[Ivf.build]] contract: all
    * eager cost lives here; probes are training-free). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nCells: Int, m: Int, ksub: Int, seed: Long = 42L,
            maxFitRows: Long = Ivf.MaxFitRows): Index = {
    val (assignedVec, centers) = Ivf.assign(corpus, idCol, vecCol, nCells,
      seed, maxFitRows)
    val spark = corpus.sparkSession
    // residual = unit-normalized vector − its cell centroid, map-side via
    // a broadcast of the (tiny) centroid table
    val resid = assignedVec
      .join(broadcast(centersDf(spark, centers)), Seq("cell"))
      .withColumn("_vn", zip_with(col("_vn"), col("_ctr"), (x, c) => x - c))
    val cb = Pq.fitVecs(resid.select("_vn"), m, ksub, seed, maxFitRows)
    val assigned = resid
      .select(col(idCol), col("cell"),
        Pq.encodeCol(col("_vn"), cb).as("pq_code"))
      .repartition(col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    Index(assigned, centers, cb, idCol)
  }

  /** Probe: rank cells per query (broadcast-side arithmetic, the
    * [[Ivf.probe]] shape), ADC-score ONLY the probed cells' codes against
    * the per-(query, cell) residual query `q − ctr`, shortlist
    * k·shortlistFactor, then exact re-rank from `corpus`. */
  def probe(index: Index, corpus: DataFrame, vecCol: String,
            queries: DataFrame, qIdCol: String, qVecCol: String,
            k: Int, nProbe: Int, shortlistFactor: Int = 5): DataFrame = {
    require(nProbe >= 1 && nProbe <= index.centers.length,
      s"nProbe=$nProbe out of [1,${index.centers.length}]")
    require(shortlistFactor >= 1, s"shortlistFactor=$shortlistFactor")
    val idCol = index.idCol
    val np = math.min(nProbe, index.centers.length)
    val centerRows = array(index.centers.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"), array(c.map(lit(_)): _*).as("ctr"))
    }: _*)
    val dist2 = aggregate(
      zip_with(col("_qn"), col("_ctr"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val probeW = Window.partitionBy(col(qIdCol)).orderBy(col("_d2").asc, col("cell"))
    // (query, cell, residual-query) — tiny: queries × nProbe rows
    val qCells = queries
      .select(col(qIdCol), unitNorm(col(qVecCol)).as("_qn"))
      .select(col(qIdCol), col("_qn"), explode(centerRows).as("cc"))
      .select(col(qIdCol), col("_qn"), col("cc.cell").as("cell"), col("cc.ctr").as("_ctr"))
      .withColumn("_d2", dist2)
      .withColumn("_pr", row_number().over(probeW))
      .where(col("_pr") <= np)
      .withColumn("_qres", zip_with(col("_qn"), col("_ctr"), (x, c) => x - c))
      .select(col(qIdCol), col("cell"), col("_qres"))

    // shortlist via the TopKRows bounded heap, not a per-query row_number
    // window: the probed cells bound the candidates, but a window would
    // still sort every probed-cell code through one task per query — the
    // heap moves ≤ k·shortlistFactor rows per (query, task)
    val scored = index.assigned
      .join(broadcast(qCells), Seq("cell"))
      .where(col(idCol) =!= col(qIdCol))
      .withColumn("adc_d2", Pq.adcCol(col("pq_code"), col("_qres"), index.cb))
      .select(col(qIdCol), col(idCol), col("adc_d2"))
    val shortlist = Analytics.topKPerGroupAgg(scored, Seq(qIdCol), "adc_d2",
        idCol, k * shortlistFactor, ascending = true)
      .select(col(qIdCol), col(idCol))

    val cn = corpus.select(col(idCol), unitNorm(col(vecCol)).as("_vn"))
    val qn = queries.select(col(qIdCol), unitNorm(col(qVecCol)).as("_qn"))
    val rescored = cn.join(broadcast(shortlist), Seq(idCol))
      .join(broadcast(qn), Seq(qIdCol))
      .withColumn("cos_sim", round(dotCol(col("_qn"), col("_vn")), 6))
      .select(col(qIdCol), col(idCol), col("cos_sim"))
    Analytics.topKPerGroupAgg(rescored, Seq(qIdCol), "cos_sim", idCol, k)
  }

  /** Persist a built index: the code relation as parquet PARTITIONED BY
    * cell (a probe's broadcast cell join prunes to the probed cells'
    * directories on disk — the [[Ivf.save]] contract), centroids and
    * codebooks alongside. The whole artifact is code-narrow: at 100 TB of
    * vectors the on-disk index is ~the codes (32 B/row) plus two tiny
    * tables. */
  def save(index: Index, spark: SparkSession, path: String): Unit = {
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    centersDf(spark, index.centers).select(col("cell"), col("_ctr").as("ctr"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
    import scala.jdk.CollectionConverters._
    val cbRows = index.cb.centers.zipWithIndex.flatMap { case (sub, j) =>
      sub.zipWithIndex.map { case (ctr, c) =>
        org.apache.spark.sql.Row(j, c, ctr.toSeq)
      }
    }.toSeq.asJava
    val cbSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("ctr",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = false)))
    spark.createDataFrame(cbRows, cbSchema).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Load a [[save]]d index. The code relation stays disk-resident so the
    * probe's cell join prunes partitions; centroids/codebooks are tiny and
    * collected. */
  def load(spark: SparkSession, path: String, idCol: String): Index = {
    val assigned = spark.read.parquet(s"$path/assigned")
    val centers = spark.read.parquet(s"$path/centers")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("ctr")).toArray)
    require(centers.nonEmpty, s"ivfpq load: no centroids at $path/centers")
    val cbCenters = spark.read.parquet(s"$path/codebooks")
      .orderBy("sub", "idx").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](r.fieldIndex("ctr")).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2))
      .toArray
    require(cbCenters.nonEmpty, s"ivfpq load: no codebooks at $path/codebooks")
    Index(assigned, centers, Pq.Codebooks(cbCenters), idCol)
  }

  /** One-shot build + probe (gate shape; deployments [[build]] once). */
  def topK(corpus: DataFrame, queries: DataFrame,
           idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
           k: Int, nCells: Int, nProbe: Int, m: Int, ksub: Int,
           seed: Long = 42L, shortlistFactor: Int = 5): DataFrame = {
    val idx = build(corpus, idCol, vecCol, nCells, m, ksub, seed)
    probe(idx, corpus, vecCol, queries, qIdCol, qVecCol, k, nProbe, shortlistFactor)
  }
}
