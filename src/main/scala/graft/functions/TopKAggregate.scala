package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k as ONE hash aggregate — the scale shape for "top k rows
  * per group": each task keeps a k-bounded min-heap per group (map-side
  * partial aggregation), partial heaps merge in the reduce, and the
  * result is the k LARGEST values of `child` (a sort-key struct) in
  * descending order. The window formulation (`row_number` over a
  * per-group sort) must materialize and SORT every group member through
  * the shuffle; this carries at most k rows per group per task — at
  * 100 TB the difference between shuffling the corpus and shuffling
  * k × #groups × #tasks heap entries.
  *
  * Ordering is the struct's natural lexicographic order; encode
  * "metric DESC, id ASC" as `struct(metric, -id, payload)` (the
  * [[graft.operators.Analytics.topKPerGroupAgg]] wrapper does this).
  * Registered in SQL as `graft_topk(sortStruct, k)`.
  */
case class TopKRows(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"graft_topk k=$k must be positive")

  @transient private lazy val structType =
    child.dataType.asInstanceOf[StructType]

  // min-heap: head = SMALLEST retained row, evicted first when full
  @transient private lazy val rowOrdering: Ordering[InternalRow] = {
    val base = PhysicalDataType.ordering(child.dataType)
      .asInstanceOf[Ordering[Any]]
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        -base.compare(a, b)
    }
  }

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects an orderable struct, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(rowOrdering)

  override def update(buffer: mutable.PriorityQueue[InternalRow],
                      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buffer.size < k) {
        buffer.enqueue(row.copy())
      } else if (rowOrdering.compare(row, buffer.head) < 0) {
        // rowOrdering is the REVERSED natural order (so the queue's head
        // is the smallest retained row); compare < 0 under it means the
        // incoming row is naturally LARGER than that minimum — keep it
        buffer.dequeue()
        buffer.enqueue(row.copy())
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buffer.size < k) buffer.enqueue(row)
      else if (rowOrdering.compare(row, buffer.head) < 0) {
        buffer.dequeue(); buffer.enqueue(row)
      }
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[InternalRow]): Any = {
    // largest first — dequeueAll yields heap order (smallest first), reverse
    val sorted = buffer.clone().dequeueAll.reverse
    new GenericArrayData(sorted.toArray[Any])
  }

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(buffer: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { row =>
      val unsafe = serProj(InternalRow(row))
      out.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val unsafe = new UnsafeRow(1)
      unsafe.pointTo(rowBytes, size)
      buf.enqueue(unsafe.getStruct(0, structType.length).copy())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
}
