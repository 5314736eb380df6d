package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded frequency table: at most `capacity` tracked items. */
final class HeavyHittersBuffer(
    val capacity: Int, val counts: mutable.HashMap[Any, Long])

/** `heavy_hitters(value, capacity) -> MAP<value type, BIGINT>` — the
  * Misra-Gries frequent-items summary, the bounded-memory answer to
  * "which tokens dominate this 100 TB corpus" (boilerplate detection,
  * stopword discovery) when a full groupBy's key set cannot fit
  * anywhere.
  *
  * State is O(capacity) per group regardless of stream length; update
  * is the classic decrement-all step, and MERGE follows the mergeable-
  * summaries construction (sum counts, subtract the (capacity+1)-th
  * largest, drop non-positives — Agarwal et al., "Mergeable
  * Summaries", PODS 2012), which is what makes the sketch fit Spark's
  * partial/final aggregation exactly like the reference's UDA contract
  * (`median.h:42-50`): map-side partials combine before the shuffle
  * and the exchange carries at most `capacity` (item, count) pairs per
  * partition.
  *
  * GUARANTEE (order- and partitioning-independent, which is what the
  * q87 gate checks): for every item x with true count f(x) over n
  * total items, the estimate m(x) (0 if untracked) satisfies
  * `m(x) <= f(x)` and `f(x) - m(x) <= n / (capacity + 1)`.
  */
case class HeavyHittersAgg(
    child: Expression,
    kExp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ConstantKAggregate[HeavyHittersBuffer] {

  override protected def kName: String = "capacity"

  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(k, mutable.HashMap.empty)

  override def update(buf: HeavyHittersBuffer, input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.counts.get(v) match {
        case Some(c) => buf.counts.update(v, c + 1)
        case None if buf.counts.size < buf.capacity =>
          buf.counts.update(ops.retain(v), 1L)
        case None =>
          // decrement-all: every tracked count absorbs this occurrence
          val dead = mutable.ArrayBuffer.empty[Any]
          buf.counts.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.counts.update(key, c - 1)
          }
          dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(buf: HeavyHittersBuffer, other: HeavyHittersBuffer): HeavyHittersBuffer = {
    other.counts.foreach { case (key, c) =>
      buf.counts.update(key, buf.counts.getOrElse(key, 0L) + c)
    }
    if (buf.counts.size > buf.capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive remainder — at most `capacity` survive
      val sorted = buf.counts.values.toArray.sorted(Ordering[Long].reverse)
      val cut = sorted(buf.capacity)
      val dead = mutable.ArrayBuffer.empty[Any]
      buf.counts.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else buf.counts.update(key, c - cut)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: HeavyHittersBuffer): Any =
    if (buf.counts.isEmpty) null
    else {
      // deterministic map layout (count desc, then key): HashMap
      // iteration order varies across JVMs/runs, and a user hashing or
      // diffing the emitted MAP directly would see spurious changes
      implicit val keyOrd: Ordering[Any] = ops.ordering
      val entries = buf.counts.toArray
        .sortBy { case (key, c) => (-c, key) }
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(_._1)),
        new GenericArrayData(entries.map(e => e._2: Any)))
    }

  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    var payload = 0
    entries.foreach(e => payload += ops.codec.size(e._1) + 8)
    val bb = ByteBuffer.allocate(8 + payload)
    bb.putInt(buf.capacity)
    bb.putInt(entries.length)
    entries.foreach { case (key, c) => ops.codec.write(bb, key); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val cap = bb.getInt
    val n = bb.getInt
    val buf = new HeavyHittersBuffer(cap, mutable.HashMap.empty)
    var i = 0
    while (i < n) { buf.counts.update(ops.codec.read(bb), bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0), kExp = newChildren(1))

  override def prettyName: String = "heavy_hitters"
}
