package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Native top-k aggregate: `graft_topk(value, k)` keeps the k largest
  * BIGINT values per group (multiset semantics, duplicates retained) and
  * returns them sorted descending.
  *
  * This is the `TypedImperativeAggregate` tier of SURVEY §2.2's extension
  * preference order — the declarative equivalent
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`) sorts every
  * group in full; the aggregate keeps a bounded min-heap per group
  * (O(n log k) work, O(k) state), combines partial heaps map-side like any
  * other partial aggregation, and never materializes a per-group sort. At
  * 100 TB group sizes that is the difference between a heap of k longs and
  * a shuffle-and-sort of the group's every row.
  *
  * Result is a deterministic function of the group's value multiset
  * (ties at the boundary keep *values*, which are equal — no row identity
  * leaks), so it is exactly reproducible by the SQL window form.
  */
case class LongTopK(left: Expression, right: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
    with BinaryLike[Expression] {

  // min-heap: smallest retained value at the head, evicted first
  private def newHeap = mutable.PriorityQueue.empty[Long](Ordering.Long.reverse)

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT value column, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT k, got ${right.sql}")
    else if (right.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-null k")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] = newHeap

  override def update(buffer: mutable.PriorityQueue[Long],
                      input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = left.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buffer.size < k) buffer.enqueue(x)
      else if (x > buffer.head) { buffer.dequeue(); buffer.enqueue(x) }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[Long],
                     other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach { x =>
      if (buffer.size < k) buffer.enqueue(x)
      else if (x > buffer.head) { buffer.dequeue(); buffer.enqueue(x) }
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buffer.toArray.sorted(Ordering.Long.reverse))

  override def serialize(buffer: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = newHeap
    var i = 0
    while (i < n) { h.enqueue(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongTopK =
    copy(left = newLeft, right = newRight)
}
