package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-style classifier step of
  * public LLM data pipelines (GPT-3/LLaMA data work: a linear classifier
  * scores "does this look like reference text", and the corpus is
  * filtered or importance-sampled on that score). Heuristic signals
  * ([[TextAnalysis.quality]], [[TextAnalysis.gopherSignals]]) are the
  * FEATURES; this learns how to weigh them.
  *
  * Split of labor (the [[graft.functions.Bpe]] convention): [[fit]] is a
  * bounded DRIVER-SIDE deterministic fit — logistic regression by
  * full-batch gradient descent on an id-ordered, hard-capped sample with
  * standardized features, fixed iterations and rate, so the same data
  * yields the same model on any engine or partitioning. [[score]] is the
  * distributed half: a pure codegen'd column expression
  * `sigmoid(w·standardize(x) + b)` — map-side, zero shuffles,
  * SQL-reproducible when the model is a literal (the gate oracles it).
  */
object QualityClassifier {

  /** A fitted linear model over named numeric feature columns. `means` /
    * `stds` are the training-sample standardization; scoring re-applies
    * them so weights stay comparable across features. */
  final case class Model(features: Seq[String], means: Array[Double],
                         stds: Array[Double], weights: Array[Double],
                         bias: Double) {
    require(features.nonEmpty && features.size == means.length &&
      features.size == stds.length && features.size == weights.length,
      "model arity mismatch")
  }

  /** Fit on up to `maxRows` rows (id-ordered — deterministic under any
    * partitioning), label column boolean or numeric 0/1. NULL features
    * impute to the sample mean (standardized 0 — the no-signal value). */
  def fit(df: DataFrame, idCol: String, features: Seq[String],
          labelCol: String, maxRows: Int = 10000, iters: Int = 300,
          lr: Double = 0.5): Model = {
    require(features.nonEmpty, "need at least one feature")
    require(iters >= 1 && lr > 0, s"iters=$iters lr=$lr")
    val rows = df
      .select((col(idCol) +: col(labelCol).cast("double") +:
        features.map(f => col(f).cast("double"))): _*)
      .orderBy(col(idCol)).limit(maxRows).collect()
    require(rows.nonEmpty, "empty training sample")
    val n = rows.length
    val k = features.size
    val y = rows.map(r => if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    val raw = Array.tabulate(n, k)((i, j) =>
      if (rows(i).isNullAt(j + 2)) Double.NaN else rows(i).getDouble(j + 2))
    val means = Array.tabulate(k) { j =>
      val vs = (0 until n).map(raw(_)(j)).filterNot(_.isNaN)
      if (vs.isEmpty) 0.0 else vs.sum / vs.size
    }
    val stds = Array.tabulate(k) { j =>
      val vs = (0 until n).map(raw(_)(j)).filterNot(_.isNaN)
      val s = if (vs.isEmpty) 0.0
        else math.sqrt(vs.map(v => (v - means(j)) * (v - means(j))).sum / vs.size)
      if (s == 0.0) 1.0 else s // constant feature: weight stays 0-gradient
    }
    val x = Array.tabulate(n, k)((i, j) =>
      if (raw(i)(j).isNaN) 0.0 else (raw(i)(j) - means(j)) / stds(j))
    val w = new Array[Double](k)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](k)
      var gb = 0.0
      var i = 0
      while (i < n) {
        var z = b
        var j = 0
        while (j < k) { z += w(j) * x(i)(j); j += 1 }
        val err = 1.0 / (1.0 + math.exp(-z)) - y(i)
        j = 0
        while (j < k) { gw(j) += err * x(i)(j); j += 1 }
        gb += err
        i += 1
      }
      var j = 0
      while (j < k) { w(j) -= lr * gw(j) / n; j += 1 }
      b -= lr * gb / n
      it += 1
    }
    Model(features, means, stds, w, b)
  }

  /** The scoring expression: `1 / (1 + exp(-(w·standardize(x) + b)))`.
    * NULL features impute to the training mean, matching [[fit]]. */
  def scoreCol(m: Model): Column = {
    val z = m.features.indices.map { j =>
      lit(m.weights(j)) *
        ((coalesce(col(m.features(j)).cast("double"), lit(m.means(j))) -
          lit(m.means(j))) / lit(m.stds(j)))
    }.foldLeft(lit(m.bias): Column)(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Score a frame that already carries the model's feature columns. */
  def score(df: DataFrame, m: Model,
            outCol: String = "lr_quality"): DataFrame =
    df.withColumn(outCol, scoreCol(m))
}
