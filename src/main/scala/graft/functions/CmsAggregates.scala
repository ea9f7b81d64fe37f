package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min sketch construction and union as hash aggregates — the
  * FREQUENCY member of the mergeable monitoring family (HLL distincts,
  * KLL quantiles, Misra–Gries heavy hitters, Bloom membership): a
  * fixed-size counter table answering "about how often has THIS key been
  * seen?" for ANY key, with the one-sided guarantee
  * `true ≤ estimate ≤ true + ε·n` at the configured confidence —
  * MG tracks only the heavy keys; CMS prices a point query on every key.
  *
  * Merge is COUNTER-WISE ADDITION of identically-shaped tables: order-
  * independent and tree-shape-independent, so a merged sketch is
  * BIT-IDENTICAL to the direct single-pass build over the same rows
  * (spec-pinned exactly — stronger than HLL's sub-RSE estimator band).
  * Addition is NOT idempotent, so landed sketch rows must be
  * exactly-once — precisely what [[graft.streaming.SketchStream]]'s
  * `_batch_id` dynamic-overwrite discipline provides.
  *
  * Geometry (depth × width) derives from literal `(eps, confidence,
  * seed)` at plan time, so every partial everywhere is merge-compatible.
  * Strings hash via their UTF-8 bytes, integral types widen to long —
  * probe with [[CmsRelation.estimate]]/`estimateCount` using the same
  * types. Nulls are skipped (a frequency probe key is never null).
  *
  * Registered in SQL as `graft_cms_build(col, eps, confidence, seed)`
  * and `graft_cms_merge(sketchBytes)`.
  */
case class CmsBuildAgg(child: Expression, eps: Double, confidence: Double,
                       seed: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  require(eps > 0.0 && eps < 1.0, s"graft_cms_build eps=$eps")
  require(confidence > 0.0 && confidence < 1.0,
    s"graft_cms_build confidence=$confidence")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_build expects string/long/int, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_build"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buffer: CountMinSketch,
                      input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.addString(v.asInstanceOf[UTF8String].toString)
      case LongType => buffer.addLong(v.asInstanceOf[Long])
      case IntegerType => buffer.addLong(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buffer
  }

  override def merge(buffer: CountMinSketch,
                     other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = buffer.toByteArray

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** Union of persisted CMS sketch bytes — the `hll_union_agg` twin for
  * frequency tables: counter-wise addition of identically-shaped
  * sketches (incompatible geometries fail loudly in `mergeInPlace`).
  * Null inputs are skipped so sparse groups union cleanly. */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[CountMinSketch]] {

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_merge expects sketch bytes (binary), got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_merge"

  override def createAggregationBuffer(): Option[CountMinSketch] = None

  override def update(buffer: Option[CountMinSketch],
                      input: InternalRow): Option[CountMinSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]])
      buffer match {
        case Some(acc) => acc.mergeInPlace(incoming); buffer
        case None => Some(incoming)
      }
    }
  }

  override def merge(buffer: Option[CountMinSketch],
                     other: Option[CountMinSketch]): Option[CountMinSketch] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.mergeInPlace(b); buffer
      case (None, b) => b
      case (a, None) => a
    }

  override def eval(buffer: Option[CountMinSketch]): Any =
    buffer.map(_.toByteArray).orNull

  override def serialize(buffer: Option[CountMinSketch]): Array[Byte] =
    buffer.map(_.toByteArray).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[CountMinSketch] =
    if (bytes.isEmpty) None else Some(CountMinSketch.readFrom(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
}
