package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, ShortType}

/** Product-quantization kernels (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search" — reference repo has no ANN
  * surface; this is a scale-path extension alongside LSH and IVF).
  *
  * A d-dim vector is split into `m` subvectors of `d/m` dims; each subvector
  * is replaced by the index of its nearest per-subspace k-means centroid.
  * The code is `m` small ints (≤2 bytes each) instead of `d` floats — at
  * d=64/m=8 a 16× narrower corpus representation, which at 100 TB is the
  * difference between scanning/shuffling embeddings and scanning codes.
  *
  * Both kernels are full-codegen fused loops with the codebooks attached
  * once per codegen instance via `addReferenceObj` (the [[BloomMightContain]]
  * pattern) — no per-row boxing, no lambda dispatch.
  *
  * Codebook layout: `centers(j)(c)(t)` = coordinate `t` of centroid `c` in
  * subspace `j`; subspaces may have different effective centroid counts
  * (k-means can return fewer than the requested k).
  */
object PqKernels {

  /** Argmin over a subspace's centroids, strict `<` so ties break to the
    * LOWEST centroid index — deterministic across runs and engines. */
  def encode(vec: ArrayData, centers: Array[Array[Array[Float]]]): Array[Short] = {
    val m = centers.length
    val out = new Array[Short](m)
    var j = 0
    while (j < m) {
      val sub = centers(j)
      val dsub = sub(0).length
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < sub.length) {
        val ctr = sub(c)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = vec.getDouble(base + t) - ctr(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toShort
      j += 1
    }
    out
  }

  /** Asymmetric distance: exact squared L2 between the RAW query vector and
    * the code's reconstruction (the concatenated centroids) — the "ADC" of
    * the paper. Identity pinned in PqSpec: adc(code, q) ==
    * ||q - decode(code)||² exactly. */
  def adc(code: ArrayData, q: ArrayData, centers: Array[Array[Array[Float]]]): Double = {
    val m = centers.length
    var s = 0.0
    var j = 0
    while (j < m) {
      val ctr = centers(j)(code.getShort(j))
      val dsub = ctr.length
      val base = j * dsub
      var t = 0
      while (t < dsub) {
        val diff = q.getDouble(base + t) - ctr(t)
        s += diff * diff
        t += 1
      }
      j += 1
    }
    s
  }
}

/** `PqEncode(vec)` → `array<smallint>` of length m: the vector's PQ code. */
case class PqEncode(child: Expression, centers: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(ShortType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  // nested-array equals/hashCode are reference-based; compare by value so
  // expression canonicalization can unify identical encodes
  override def equals(other: Any): Boolean = other match {
    case PqEncode(c, cs) => c == child && java.util.Arrays.deepEquals(
      cs.asInstanceOf[Array[AnyRef]], centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(PqKernels.encode(input.asInstanceOf[ArrayData], centers))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCenters", centers, "float[][][]")
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqKernels.encode($v, $cbRef))"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `PqAdc(code, qvec)` → approximate squared L2 distance (exact to the
  * code's reconstruction). Sits in the probe hot path (corpus-codes ×
  * queries), hence full codegen. */
case class PqAdc(left: Expression, right: Expression,
                 centers: Array[Array[Array[Float]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ShortType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (array<smallint>, array<double>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override def equals(other: Any): Boolean = other match {
    case PqAdc(l, r, cs) => l == left && r == right && java.util.Arrays.deepEquals(
      cs.asInstanceOf[Array[AnyRef]], centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])

  override protected def nullSafeEval(code: Any, q: Any): Any =
    PqKernels.adc(code.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData], centers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, q) => {
      val cbRef = ctx.addReferenceObj("pqCenters", centers, "float[][][]")
      s"graft.functions.PqKernels.adc($c, $q, $cbRef)"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
