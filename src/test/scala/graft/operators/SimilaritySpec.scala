package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine column expression matches hand computation") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(math.abs(c - 1.0 / math.sqrt(2.0)) < 1e-12)
  }

  test("graft_cosine native expression agrees with functions-composed cosine") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val pairs = e.select(col("vec_id").as("i"), col("v").as("va"))
      .crossJoin(e.select(col("vec_id").as("j"), col("v").as("vb")))
      .where(col("i") < col("j")).limit(200)
    val diff = pairs.select(
        abs(call_function("graft_cosine", col("va"), col("vb")) -
            Similarity.cosine(col("va"), col("vb"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(diff < 1e-12)
  }

  test("bruteForceTopK exact on a crafted corpus") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val out = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding",
        "q_id", "q_vec", 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(2L, 3L)) // nearest then orthogonal; -1 last, self excluded
  }

  test("lshTopK recall vs brute force on real embeddings") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", "q_id", "q_vec",
        10, nTables = 12, planesPerTable = 4, dim = 64)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall degraded: $recall")
  }

  test("fused HyperplaneSignatures == interpreted lshSignature bitwise, per table") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val interp = (0 until 12).map(t =>
      Similarity.lshSignature(col("v"), Similarity.hyperplanes(4, 64, 42L + t)))
    val mismatches = e
      .where(Similarity.lshSignatures(col("v"), 12, 4, 64, 42L) =!= array(interp: _*))
      .count()
    assert(mismatches == 0)
  }

  test("neardupPairsLsh agrees with exact neardupPairs (subset, identical scores)") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val exact = Similarity.neardupPairs(e, "vec_id", "embedding", 0.35)
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val lsh = Similarity.neardupPairsLsh(e, "vec_id", "embedding", 0.35,
        nTables = 12, planesPerTable = 4, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (i, j, c) =>
      assert(exact.get((i, j)).contains(c),
        s"LSH pair ($i,$j,$c) not in exact set with identical score")
    }
    val recall = lsh.length.toDouble / exact.size
    assert(recall >= 0.6, s"LSH pair recall degraded: $recall (${lsh.length}/${exact.size})")
  }

  test("neardupPairsLsh plan is a bucket-local equi-join, never BroadcastNestedLoop") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val plan = Similarity.neardupPairsLsh(e, "vec_id", "embedding", 0.35,
        nTables = 12, planesPerTable = 4, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join in plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi-join found in plan:\n$plan")
  }

  test("HyperplaneSignatures fails fast on length mismatch instead of truncating") {
    val bad = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "v")
    val ex = intercept[Exception] {
      bad.select(Similarity.lshSignatures(col("v"), 2, 4, 64, 42L)).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))).mkString(" | ")
    assert(rootMsg(ex).contains("expected array of length 64"))
  }

  test("IVF topK: recall vs brute force; probe join is cell-local") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(e, q, "vec_id", "embedding", "q_id", "q_vec",
      k = 10, nCells = 16, nProbe = 4)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs probe:\n$plan")
    val got = ivf.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got.size == brute.size) // 8 queries x 10 = full result set
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall degraded: $recall")
  }

  test("IVF sample-fit quantizer (maxFitRows < corpus) keeps recall and assigns every row") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val n = e.count()
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "q_id", "q_vec", 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // cap the training set well below the corpus so the sample branch runs
    val cap = math.max(64L, n / 4)
    assert(cap < n, s"fixture too small to force the sample path (n=$n)")
    val (assigned, centers) = Ivf.assign(e, "vec_id", "embedding", nCells = 16,
      maxFitRows = cap)
    assert(centers.length == 16)
    assert(assigned.count() == n, "sample-fit must still assign the FULL corpus")
    val got = Ivf.topK(e, q, "vec_id", "embedding", "q_id", "q_vec",
        k = 10, nCells = 16, nProbe = 4, maxFitRows = cap)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.5, s"sample-fit IVF recall degraded: $recall")
  }

  test("IVF edge: n just over maxFitRows ≈ nCells — nCells reflects the real centers") {
    // 60 distinct-ish vectors, cap 50, request 48 cells: the limited sample
    // holds ≤50 points with few distinct values, so k-means returns FEWER
    // centers than requested — the index must report what exists, and a
    // probe asking for every reported cell must work
    val e = spark.range(60).select(col("id").as("vec_id"),
      array((0 until 4).map(j => (col("id") % 5 * (j + 1)).cast("float") + lit(1f)): _*)
        .as("embedding"))
    val index = Ivf.build(e, "vec_id", "embedding", nCells = 48, maxFitRows = 50)
    try {
      assert(index.nCells == index.centers.length)
      assert(index.nCells <= 48)
      val q = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val out = Ivf.probe(index, q, "q_id", "q_vec", k = 5, nProbe = index.nCells)
        .groupBy("q_id").count().collect()
      assert(out.length == 3 && out.forall(_.getLong(1) == 5))
      // the declared cap is HARD: the fit input can never exceed it even
      // though Bernoulli sampling alone could overshoot 50/60
      val (assigned, _) = Ivf.assign(e, "vec_id", "embedding",
        nCells = 2, maxFitRows = 50)
      assert(assigned.count() == 60, "assignment always covers the full corpus")
    } finally index.unpersist()
  }

  test("IVF build/probe: probe == one-shot topK; plan probes the persisted index, no training") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val oneShot = Ivf.topK(e, q, "vec_id", "embedding", "q_id", "q_vec",
        k = 10, nCells = 16, nProbe = 4)
      .select("q_id", "vec_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val index = Ivf.build(e, "vec_id", "embedding", nCells = 16)
    try {
      val probe = Ivf.probe(index, q, "q_id", "q_vec", k = 10, nProbe = 4)
      val plan = probe.queryExecution.executedPlan.toString
      // the probe must hit the persisted index (cache scan), join on cell
      // as an equi-join, and carry no KMeans/training operator
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"probe does not scan the persisted index:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs probe:\n$plan")
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), s"no equi-join in probe plan:\n$plan")
      val got = probe.select("q_id", "vec_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == oneShot, "probe of built index diverged from one-shot topK")

      // disk round-trip: a saved+loaded index probes identically, and the
      // loaded probe plan prunes index partitions dynamically (or statically
      // via the broadcast) instead of scanning every cell directory
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      Ivf.save(index, spark, dir)
      val loaded = Ivf.load(spark, dir, "vec_id")
      assert(loaded.nCells == 16)
      assert(loaded.centers.map(_.toSeq).sameElements(index.centers.map(_.toSeq)))
      val fromDisk = Ivf.probe(loaded, q, "q_id", "q_vec", k = 10, nProbe = 4)
        .select("q_id", "vec_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(fromDisk == oneShot, "probe of disk-loaded index diverged")
    } finally index.unpersist()
  }

  test("neardupPairs symmetric threshold filter") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.01f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.neardupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("decontaminateSemantic == threshold-filtered cosine vs eval, no shuffle in plan") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val eval = e.where(col("vec_id") % 50 === 0)
    val out = Similarity.decontaminateSemantic(e, eval,
        "vec_id", "embedding", "vec_id", "embedding", threshold = 0.3)
      .where(col("vec_id") =!= col("eval_id"))
    val got = out.select("vec_id", "eval_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    // reference via the existing (oracled) all-pairs path, restricted to
    // pairs touching the eval carve, re-oriented to (corpus, eval)
    val ref = Similarity.neardupPairs(e, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
      .flatMap { p: (Long, Long, Double) =>
        val (i, j, cs) = p
        Seq(i -> j, j -> i).collect {
          case (c, ev) if ev % 50 == 0 && c % 50 != 0 => (c, ev, cs)
        } ++ (if (i % 50 == 0 && j % 50 == 0) Seq((i, j, cs), (j, i, cs)) else Nil)
      }
    assert(got == ref)
    val plan = out.queryExecution.executedPlan.toString
    // the eval side BROADCASTS (by design); the corpus must never SHUFFLE
    assert(!plan.contains("Exchange hashpartitioning"),
      s"decontaminateSemantic must not shuffle the corpus:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"eval side should broadcast:\n$plan")
  }

  test("semanticDedup == components of (exact pairs ∩ co-celled), given its own cells") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val out = Similarity.semanticDedup(e, "vec_id", "embedding",
        nCells = 4, threshold = 0.35)
      .select("vec_id", "cell", "canonical_id", "is_dup")
      .as[(Long, Int, Long, Boolean)].collect()
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val exactPairs = Similarity.neardupPairs(e, "vec_id", "embedding", 0.35)
      .select("i", "j").as[(Long, Long)].collect()
      .filter { case (i, j) => cellOf(i) == cellOf(j) }

    // reference union-find over the co-celled exact edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exactPairs.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) { val (lo, hi) = (math.min(ri, rj), math.max(ri, rj))
        parent(hi) = lo }
    }
    out.foreach { case (id, _, canonical, isDup) =>
      assert(canonical == find(id), s"vec $id")
      assert(isDup == (find(id) != id), s"vec $id")
    }
    assert(out.exists(_._4), "corpus has planted near-dups; none flagged")
  }

  test("semanticDedup: planted exact duplicates are always recalled (same cell by construction)") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet").limit(100)
      .select("vec_id", "embedding")
    val copies = e.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val out = Similarity.semanticDedup(e.union(copies), "vec_id", "embedding",
        nCells = 8, threshold = 0.9)
      .select("vec_id", "canonical_id").as[(Long, Long)].collect().toMap
    // an identical vector lands in the identical cell; cos = 1.0 >= 0.9,
    // so every copy must share a component with its original
    (0L until 100L).filter(out.contains).foreach { id =>
      assert(out(id) == out(id + 100000L),
        s"copy of $id not grouped with its original")
    }
  }

  test("semanticDedupIndexed == cold semanticDedup (same quantizer seed)") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cold = Similarity.semanticDedup(e, "vec_id", "embedding",
        nCells = 8, threshold = 0.6)
      .select("vec_id", "cell", "canonical_id", "is_dup")
      .as[(Long, Int, Long, Boolean)].collect().toSet
    val index = Ivf.build(e, "vec_id", "embedding", nCells = 8)
    try {
      val indexed = Similarity.semanticDedupIndexed(index, threshold = 0.6)
        .select("vec_id", "cell", "canonical_id", "is_dup")
        .as[(Long, Int, Long, Boolean)].collect().toSet
      assert(indexed == cold, "indexed path diverged from cold path")
    } finally index.unpersist()
  }

  test("semanticDedup plan: cell-local equi-join, never BroadcastNestedLoop") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val (assigned, _) = Ivf.assign(e, "vec_id", "embedding", nCells = 4)
    val local = assigned.localCheckpoint(false)
    val a = local.select(col("cell"), col("vec_id").as("i"), col("_vn").as("va"))
    val b = local.select(col("cell"), col("vec_id").as("j"), col("_vn").as("vb"))
    val plan = a.join(b, Seq("cell")).where(col("i") < col("j"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
