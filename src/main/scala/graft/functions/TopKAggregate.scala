package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a min-heap of the k largest values seen. */
final class TopKBuffer(val k: Int, val heap: mutable.PriorityQueue[Any])

/** `max_k(value, k) -> ARRAY<value type>` — the k largest values per
  * group, descending (`min_k` is the mirrored form).
  *
  * Scale rationale (SURVEY §2.2 "Sorts / limits / top-k"): the window
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY v DESC)
  * <= k`) shuffles and SORTS every row of every group. This aggregate
  * keeps an O(k) min-heap per group, combines map-side before the
  * exchange, and ships only k values per group across the wire — the
  * same partial/merge contract as the reservoir aggregates, on the
  * same [[ValueOps]] type machinery (any numeric, string, decimal,
  * date or timestamp column).
  */
case class TopKAgg(
    child: Expression,
    kExp: Expression,
    descending: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ConstantKAggregate[TopKBuffer] {

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  /** Heap ordering: for max_k keep the k LARGEST -> evict the smallest
    * first (min-heap); for min_k the mirror. */
  @transient private lazy val heapOrd: Ordering[Any] =
    if (descending) ops.ordering.reverse else ops.ordering

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, mutable.PriorityQueue.empty(heapOrd))

  private def insert(buf: TopKBuffer, v: Any): Unit = {
    if (buf.heap.size < buf.k) buf.heap.enqueue(v)
    else if (heapOrd.lt(v, buf.heap.head)) { buf.heap.dequeue(); buf.heap.enqueue(v) }
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, ops.retain(v))
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    if (buf.heap.isEmpty) null
    else {
      val arr = buf.heap.toArray
      val sorted =
        if (descending) arr.sorted(ops.ordering.reverse) else arr.sorted(ops.ordering)
      new GenericArrayData(sorted)
    }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val values = buf.heap.toArray
    var payload = 0
    values.foreach(v => payload += ops.codec.size(v))
    val bb = ByteBuffer.allocate(8 + payload)
    bb.putInt(buf.k)
    bb.putInt(values.length)
    values.foreach(v => ops.codec.write(bb, v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val buf = new TopKBuffer(kk, mutable.PriorityQueue.empty(heapOrd))
    var i = 0
    while (i < n) { buf.heap.enqueue(ops.codec.read(bb)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExp = newChildren(1))

  override def prettyName: String = if (descending) "max_k" else "min_k"
}
