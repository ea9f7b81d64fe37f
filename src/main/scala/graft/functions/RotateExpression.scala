package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Orthonormal-rotation kernel for OPQ (Ge, He, Ke, Sun 2013, "Optimized
  * Product Quantization"): `x → x·R`, the map-side projection applied to
  * every corpus and query vector before PQ encoding/ADC. The rotation is
  * a d×d matrix flattened row-major and attached once per codegen
  * instance (`addReferenceObj`, the [[PqKernels]] pattern) — the hot
  * path stays one fused whole-stage-codegen loop, no per-row boxing.
  */
object RotateKernels {

  /** Row-vector times matrix: `out(i) = Σ_j v(j) · flat(j·d + i)`. */
  def rotate(vec: ArrayData, flat: Array[Float], d: Int): GenericArrayData = {
    val out = new Array[Double](d)
    var j = 0
    while (j < d) {
      val vj = vec.getDouble(j)
      if (vj != 0.0) {
        val base = j * d
        var i = 0
        while (i < d) {
          out(i) += vj * flat(base + i)
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `RotateVector(vec)` → `array<double>` of the same length: `vec · R`
  * for the row-major-flattened d×d rotation baked into the expression. */
case class RotateVector(child: Expression, flat: Array[Float], dim: Int)
    extends UnaryExpression {

  require(flat.length == dim * dim,
    s"graft_rotate: matrix ${flat.length} != $dim x $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rotate expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_rotate"

  // array equals/hashCode are reference-based; compare by value so
  // canonicalization can unify identical rotations
  override def equals(other: Any): Boolean = other match {
    case RotateVector(c, f, d) =>
      c == child && d == dim && java.util.Arrays.equals(f, flat)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + dim) + java.util.Arrays.hashCode(flat)

  override protected def nullSafeEval(input: Any): Any =
    RotateKernels.rotate(input.asInstanceOf[ArrayData], flat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("rotFlat", flat, "float[]")
      s"graft.functions.RotateKernels.rotate($v, $ref, $dim)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
