package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8 scalar-quantized ANN ([[Sq]]): code range/determinism, the
  * per-coordinate error bound (≤ half a quantization step — fixed, not
  * data-dependent), recall vs brute force at the gate config, and the
  * codegen span. End-to-end exactness is pinned by the gate itself:
  * `ann_sq` is hash-oracled against a DuckDB re-derivation of the whole
  * pipeline.
  */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def queriesDf =
    emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("codes are bytes, deterministic, and identical vectors share codes") {
    val a = Sq.encode(emb, "vec_id", "embedding").orderBy("vec_id").collect()
    val b = Sq.encode(emb, "vec_id", "embedding").orderBy("vec_id").collect()
    assert(a.toSeq == b.toSeq, "encode is not deterministic")
    val code = a.head.getSeq[Byte](1)
    assert(code.length == 64, s"expected 64 bytes, got ${code.length}")
  }

  test("reconstruction error per coordinate <= half a step (1/255), everywhere") {
    import graft.functions.VectorOps.unitNorm
    import org.apache.spark.sql.graft.Bridge
    val step = 2.0 / 255.0
    val worst = emb
      .select(unitNorm(col("embedding")).as("_vn"))
      .select(Sq.encodeCol(col("_vn")).as("c"), col("_vn"))
      .select(zip_with(col("c"), col("_vn"),
        (ci, xi) => abs((ci.cast("double") + 128.0) / 127.5 - 1.0 - xi)).as("errs"))
      .select(array_max(col("errs")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    // half-step plus float→double slack; clamped ends can double it, but
    // unit coords sit strictly inside [-1, 1]
    assert(worst <= step / 2 + 1e-12, s"worst per-coordinate error $worst > ${step / 2}")
  }

  test("recall vs brute force at the gate config") {
    val truth = Similarity.bruteForceTopK(emb, queriesDf, "vec_id", "embedding",
        "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = Sq.topK(emb, queriesDf, "vec_id", "embedding", "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (truth & got).size.toDouble / truth.size
    info(f"SQ8 recall@10: $recall%.3f")
    // 8-bit uniform codes on 64 dims are near-lossless for ranking; the
    // exact re-rank means only shortlist misses can cost recall
    assert(recall >= 0.95, s"recall $recall below 0.95")
  }

  test("graft_sq8_encode / graft_sq8_dot SQL functions == the library columns") {
    import graft.functions.VectorOps.unitNorm
    val a = emb.limit(50)
      .select(col("vec_id"), unitNorm(col("embedding")).as("vn"))
      .selectExpr("vec_id", "graft_sq8_dot(graft_sq8_encode(vn), vn) AS d")
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    val b = emb.limit(50)
      .select(col("vec_id"), unitNorm(col("embedding")).as("vn"))
      .select(col("vec_id"), Sq.dotCol8(Sq.encodeCol(col("vn")), col("vn")).as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    assert(a == b, "SQL-registered kernels diverge from the library columns")
    // self-dot of a unit vector through the quantizer ~ 1 within step error
    assert(a.forall(d => math.abs(d - 1.0) < 0.01), s"implausible self-dots: ${a.take(3)}")
  }

  test("Sq8Encode and Sq8Dot stay inside whole-stage codegen") {
    val codes = Sq.encode(emb, "vec_id", "embedding")
    val out = Sq.topKRerank(codes, "vec_id", emb, "embedding",
      queriesDf, "q_id", "q_vec", k = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_sq8_dot")),
      s"sq8 scoring projection fell out of codegen:\n$plan")
  }
}
