package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** 8-bit scalar quantization kernels (the FAISS `SQ8`-style uniform
  * quantizer, fixed range): unit-normalized coordinates live in [-1, 1],
  * so each becomes one byte via `round((x + 1) · 127.5)` (0..255, stored
  * biased by −128 as a signed tinyint) — 64 B per 64-dim vector instead
  * of 256 B of floats, with NO training pass (unlike PQ's k-means
  * codebooks, the quantizer is data-independent, which also makes the
  * whole ANN pipeline expressible in the DuckDB oracle — `ann_sq` is the
  * one HASH-ORACLED quantized ANN query).
  *
  * Every loop is sequential ascending-index double arithmetic so the
  * oracle SQL's left-associative inline sums reproduce it bitwise (the
  * [[Hyperplanes.planeDotSql]] parity discipline). Rounding is
  * half-away-from-zero to match SQL `round`.
  */
object SqKernels {

  private def roundHalfAway(y: Double): Double =
    if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)

  /** Unit-normalized double coords → biased SQ8 code bytes. */
  def encode(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val y = roundHalfAway((vec.getDouble(i) + 1.0) * 127.5)
      val c = math.min(255.0, math.max(0.0, y))
      out(i) = (c - 128.0).toByte
      i += 1
    }
    out
  }

  /** Approximate dot: RAW (normalized) query against the code's
    * reconstruction `(c + 128) / 127.5 − 1` — asymmetric, so query
    * precision is never quantized (the ADC discipline). */
  def dot(code: ArrayData, q: ArrayData): Double = {
    val n = math.min(code.numElements(), q.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += q.getDouble(i) * ((code.getByte(i).toDouble + 128.0) / 127.5 - 1.0)
      i += 1
    }
    s
  }
}

/** `Sq8Encode(vn)` → `array<tinyint>`: the vector's SQ8 code. Input must
  * be unit-normalized doubles ([[UnitNormalize]]). */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_encode expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def prettyName: String = "graft_sq8_encode"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(SqKernels.encode(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SqKernels.encode($v))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `Sq8Dot(code, qn)` → double: asymmetric approximate dot product. */
case class Sq8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_dot expects (array<tinyint>, array<double>), got $other")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sq8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SqKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
