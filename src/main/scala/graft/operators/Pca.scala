package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the standard
  * dimensionality-reduction / whitening step a vector pipeline runs
  * before ANN indexing (half the dims at ~no recall cost is a 2× cut in
  * every downstream scan, shuffle, and codebook).
  *
  * Scale shape: the ONLY distributed work is one pass of map-side moment
  * accumulation — each partition folds its rows into `(n, Σx, Σxxᵀ)`
  * (d + d² doubles ≈ 33 KB at d = 64) and the driver combines the
  * per-partition partials (collect is bounded by partition count, not
  * rows). The covariance eigendecomposition is a cyclic-Jacobi sweep on
  * the tiny d×d symmetric matrix — deterministic, no library, driver
  * microseconds. Projection back over the corpus is a pure map-side
  * expression (components ride into the plan as literal arrays, the
  * [[IvfPq]] centroid pattern) — no shuffle, no UDF.
  *
  * Sign convention: each component's largest-|coordinate| entry is made
  * positive, so fits are reproducible run to run (eigenvectors are
  * otherwise sign-ambiguous).
  */
object Pca {

  /** Fitted model: `mean` (d), row-major `components` (k × d, orthonormal
    * rows, descending eigenvalue), and each component's `varianceShare`
    * of the total. */
  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]],
                         varianceShare: Array[Double])

  /** Fit on `vecCol` (array column, fixed dimension). `k` = components
    * kept. One distributed pass; see the class doc for the shape. */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    require(k >= 1, s"pca: k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
    val partials = vecs.mapPartitions { it =>
      var n = 0L
      var sum: Array[Double] = null
      var ss: Array[Double] = null // packed upper triangle incl. diagonal
      it.foreach { v =>
        val x = v.toArray
        if (sum == null) { sum = new Array(x.length); ss = new Array(x.length * (x.length + 1) / 2) }
        require(x.length == sum.length,
          s"pca: ragged vectors (${x.length} vs ${sum.length})")
        n += 1
        var i = 0; var p = 0
        while (i < x.length) {
          sum(i) += x(i)
          var j = i
          while (j < x.length) { ss(p) += x(i) * x(j); p += 1; j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator((n, sum.toSeq, ss.toSeq))
    }.collect() // one row per non-empty partition — bounded by design
    require(partials.nonEmpty, "pca: empty input")
    val d = partials.head._2.size
    // raggedness is checked within each partition against its own first
    // vector; partitions can still disagree with each other — a wider
    // partial would silently truncate into wrong moments, a narrower one
    // would throw a bare IndexOutOfBounds below. Fail loudly instead.
    require(partials.forall(_._2.size == d),
      s"pca: ragged vectors across partitions (dims ${partials.map(_._2.size).distinct.sorted.mkString(",")})")
    require(k <= d, s"pca: k=$k > dim=$d")
    val n = partials.map(_._1).sum
    require(n >= 2, s"pca: need >= 2 rows, got $n")
    val sum = new Array[Double](d)
    val ss = new Array[Double](d * (d + 1) / 2)
    partials.foreach { case (_, s1, s2) =>
      var i = 0; while (i < d) { sum(i) += s1(i); i += 1 }
      var p = 0; while (p < ss.length) { ss(p) += s2(p); p += 1 }
    }
    val mean = sum.map(_ / n)
    // covariance = Σxxᵀ/n − μμᵀ (population; the estimator divisor is
    // irrelevant to directions and shares)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var p = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = ss(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(ix => -values(ix))
    val total = math.max(values.map(math.max(_, 0.0)).sum, Double.MinPositiveValue)
    val comps = order.take(k).map { ix =>
      val v = vectors.map(_(ix))
      // sign convention: largest-|coordinate| entry positive
      val m = v.indices.maxBy(jx => math.abs(v(jx)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.take(k).map(ix => math.max(values(ix), 0.0) / total).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic sweep order; converges quadratically; d ≤ a few
    * hundred is driver-trivial. */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100 && offDiag(a) > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // signum(0) would zero the rotation exactly when the two
            // diagonal entries are equal — the case that needs the full
            // 45° rotation; branch on sign instead
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Map-side projection `y = C(x − μ)` as a column expression — the
    * model rides into the plan as literal arrays, so the whole corpus
    * projects in one narrow map pass (no shuffle, no UDF). */
  def projectCol(vec: Column, model: Model): Column = {
    val meanLit = array(model.mean.map(lit(_)): _*)
    val centered = zip_with(vec.cast("array<double>"), meanLit, (x, m) => x - m)
    array(model.components.map { comp =>
      val compLit = array(comp.map(lit(_)): _*)
      aggregate(zip_with(centered, compLit, (x, c) => x * c),
        lit(0.0), (acc, e) => acc + e)
    }: _*)
  }

  /** Project `df`'s `vecCol` to the model's k dims as `outCol`. */
  def transform(df: DataFrame, vecCol: String, model: Model,
                outCol: String = "pca_vec"): DataFrame =
    df.withColumn(outCol, projectCol(col(vecCol), model))

  /** Mean squared reconstruction error of the rank-k model over `df` —
    * the measured quantity that picks k (`1 − Σ varianceShare` predicts
    * it; this verifies it on data). One map pass. */
  def reconstructionMse(df: DataFrame, vecCol: String, model: Model): Double = {
    val proj = projectCol(col(vecCol), model)
    // ‖x − μ‖² − ‖y‖²: with orthonormal rows, the residual energy is the
    // centered norm minus the projected norm — no d-dim reconstruction
    val meanLit = array(model.mean.map(lit(_)): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit, (x, m) => x - m)
    val cn2 = aggregate(transform_(centered), lit(0.0), (a, e) => a + e)
    val pn2 = aggregate(transform_(proj), lit(0.0), (a, e) => a + e)
    val r = df.agg(avg(cn2 - pn2)).head()
    if (r.isNullAt(0)) 0.0 else math.max(0.0, r.getDouble(0))
  }

  private def transform_(v: Column): Column =
    org.apache.spark.sql.functions.transform(v, x => x * x)
}
