package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter construction as ONE hash aggregate — the builder twin of
  * the probe-side [[BloomMightContain]]: each task folds its rows into a
  * local filter (map-side partial aggregation), partials OR-merge in the
  * reduce (`mergeInPlace` — Bloom filters of identical geometry are
  * bitwise-mergeable), and the result is the serialized filter bytes.
  * Grouped by file identity this yields PER-FILE membership indexes in a
  * single table scan ([[graft.sources.StatsIndex.buildBlooms]]) instead
  * of one driver-looped scan per file.
  *
  * Geometry is fixed by (expectedItems, fpp) at plan time, so every
  * partial across every task/group is merge-compatible. Inputs hash
  * exactly as the probe side does: strings via `putString` (UTF-8
  * bytes — [[BloomMightContain]]'s `mightContainString` convention),
  * integral types widened to long via `putLong`. Nulls are skipped —
  * an equality probe value is never null (SQL `= NULL` is never true).
  *
  * Registered in SQL as `graft_bloom_build(col, expectedItems, fpp)`.
  */
case class BloomBuildAgg(child: Expression, expectedItems: Long, fpp: Double,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"graft_bloom_build expectedItems=$expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"graft_bloom_build fpp=$fpp")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build expects string/long/int, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.putString(v.asInstanceOf[UTF8String].toString)
      case LongType => buffer.putLong(v.asInstanceOf[Long])
      case IntegerType => buffer.putLong(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
}
