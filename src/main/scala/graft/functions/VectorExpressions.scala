package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over double arrays.
  *
  * The `functions`-composed variant ([[graft.operators.Similarity.cosine]])
  * walks three HigherOrderFunction lambdas per row; this expression is a
  * single fused loop with full codegen (`doGenCode`) — no lambda dispatch,
  * no intermediate arrays — which is the preferred shape for the ANN hot
  * path at scale (SURVEY.md §2 #34).
  *
  * Inputs must be array<double> — cast float embeddings first
  * (`transform(v, x -> CAST(x AS DOUBLE))` or `v::DOUBLE[]`-equivalent).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), " +
      s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused-loop dot product over two array<double> columns (codegen).
  * With pre-normalized vectors this IS cosine similarity at a third of the
  * flops of [[CosineSimilarity]] per pair — the all-pairs hot path uses it
  * via [[graft.operators.Similarity.neardupPairs]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
      s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused unit-normalization over a float- or double-array column: one loop
  * computes the sum of squares (index order — bitwise-identical to the
  * previous `aggregate(transform(cast))` lambda fold), a second emits
  * `x_i / sqrt(sum)`. Replacing the HigherOrderFunction composition
  * matters beyond constant factors: `transform`/`aggregate` are
  * CodegenFallback in Spark, so ANY projection containing them falls out
  * of whole-stage codegen — which silently un-fused every ANN operator's
  * prep stage. With this expression the whole normalize→encode/dot
  * pipeline stays inside one codegen span (asserted in PqSpec).
  *
  * Element nulls are not handled (the embedding corpus contract has
  * none); float elements are widened exactly as `CAST(x AS DOUBLE)` does.
  */
case class UnitNormalize(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unit_norm expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_unit_norm"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out =
      if (elemType == FloatType) UnitNormalize.normalizeF(arr)
      else UnitNormalize.normalizeD(arr)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val helper = if (elemType == FloatType) "normalizeF" else "normalizeD"
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.UnitNormalize.$helper($v))"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnitNormalize {
  def normalizeD(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n); i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    out
  }

  def normalizeF(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n); i = 0
    while (i < n) { out(i) = a.getFloat(i).toDouble / norm; i += 1 }
    out
  }
}

/** Shared vector column helpers — ONE definition of the cast/normalize/dot
  * pipeline so every similarity operator (brute force, LSH, IVF) stays
  * bitwise-comparable: the fold order and rounding here are what the
  * cross-operator agreement tests and the DuckDB oracles rely on.
  */
object VectorOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graft.Bridge

  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Unit-normalize a float- or double-array column (one pass per VECTOR,
    * not per pair) so pairwise cosine reduces to the codegen'd
    * [[DotProduct]]. Fused ([[UnitNormalize]]) — takes the RAW vector
    * column; no `asDouble` lambda needed (or wanted: it would break
    * whole-stage codegen). */
  def unitNorm(c: Column): Column =
    Bridge.column(UnitNormalize(Bridge.expression(c)))

  def dotCol(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
