package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Quantile-bucket index: the number of cut points ≤ the value, by binary
  * search over a sorted cut array attached via `addReferenceObj` (the
  * [[BloomMightContain]] pattern). With cuts at the k/n quantiles this
  * yields equi-POPULATED bucket ids in [0, cuts.length] — the rank
  * bucketization [[graft.operators.ZOrder]] interleaves into Morton
  * z-values. Nulls are handled by the expression framework (null in →
  * null out); callers bucket them separately if they must cluster.
  */
case class BucketIndex(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  require(cuts.nonEmpty, "BucketIndex: empty cut array")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_index expects double, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bucket_index"

  // Array equals/hashCode are reference-based; compare by value so
  // canonicalization can unify identical bucketizations
  override def equals(other: Any): Boolean = other match {
    case BucketIndex(c, cs) => c == child && java.util.Arrays.equals(cs, cuts)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cuts)

  override protected def nullSafeEval(input: Any): Any =
    BucketIndex.indexOf(input.asInstanceOf[Double], cuts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
      s"graft.functions.BucketIndex.indexOf($v, $cutsRef)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketIndex {
  /** #cuts ≤ v, via binary search: the bucket id in [0, cuts.length]. */
  def indexOf(v: Double, cuts: Array[Double]): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
