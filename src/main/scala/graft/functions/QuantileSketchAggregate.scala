package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded bucket -> count table. */
final class QuantileSketchBuffer(
    val subBucketBits: Int, val counts: mutable.HashMap[Long, Long])

/** `quantile_sketch(value BIGINT, sub_bucket_bits) -> MAP<BIGINT,
  * BIGINT>` — a mergeable quantile summary over non-negative BIGINT
  * values, completing the sketch family next to `bloom_agg`
  * (membership), HLL (cardinality), `heavy_hitters` (frequent items)
  * and `count_min` (frequencies): "what is p99 of this 100 TB column"
  * in O(1) state per group.
  *
  * The bucketing is the HDR-histogram / DDSketch construction
  * (log-scaled buckets with linear sub-buckets; Masson et al.,
  * "DDSketch", VLDB 2019): for b = sub_bucket_bits and v >= 0,
  *
  *   e      = floor(log2 v)          (0 for v = 0)
  *   shift  = max(0, e - b)
  *   bucket = shift * 2^b + (v >> shift)
  *
  * Values below 2^(b+1) get EXACT buckets (shift 0, bucket = v);
  * above, each bucket spans [sub << shift, (sub+1) << shift), so a
  * bucket's lower bound under-represents any member by a relative
  * error < 2^-b. Quantile estimates (the lower bound of the bucket
  * where the cumulative count crosses ceil(q * n)) therefore carry a
  * GUARANTEED relative error below 2^-b — the value-distribution-
  * independent bound that makes this the right shape for latency /
  * size / token-count columns. Total buckets are bounded by
  * ~(64 - b) * 2^b regardless of input size.
  *
  * Everything is integer arithmetic, so unlike KLL (randomized
  * compaction) or t-digest (insertion-order-dependent centroids) the
  * sketch is DETERMINISTIC and PARTITION-INDEPENDENT: update is a
  * bucket increment, merge is cell-wise addition (abelian), and the
  * whole grid replays in ANSI SQL — `e = length(bin(v)) - 1` /
  * DuckDB `length(printf('%b', v)) - 1` is the exact floor-log2, and
  * shifts are `>>` in both engines — so the q112 gate hash-compares
  * every cell against a DuckDB replay, the q105 count-min pattern.
  * Negative values fail loudly (the log-scaled domain is
  * non-negative by construction; pre-shift a signed column or sketch
  * its two signs separately).
  */
case class QuantileSketchAgg(
    child: Expression,
    kExp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ConstantKAggregate[QuantileSketchBuffer] {

  override protected def kName: String = "sub_bucket_bits"

  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess if child.dataType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"quantile_sketch: value must be BIGINT (cast counts/cents/" +
            s"micros explicitly), got ${child.dataType.sql}")
      case TypeCheckResult.TypeCheckSuccess if k >= 32 =>
        TypeCheckResult.TypeCheckFailure(
          "quantile_sketch: sub_bucket_bits must be below 32")
      case other => other
    }

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer(k, mutable.HashMap.empty)

  override def update(buf: QuantileSketchBuffer,
      input: InternalRow): QuantileSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val value = v.asInstanceOf[Long]
      require(value >= 0L,
        s"quantile_sketch: negative value $value (non-negative domain)")
      val b = QuantileSketchAgg.bucketOf(value, buf.subBucketBits)
      buf.counts.update(b, buf.counts.getOrElse(b, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: QuantileSketchBuffer,
      other: QuantileSketchBuffer): QuantileSketchBuffer = {
    other.counts.foreach { case (bucket, c) =>
      buf.counts.update(bucket, buf.counts.getOrElse(bucket, 0L) + c)
    }
    buf
  }

  override def eval(buf: QuantileSketchBuffer): Any =
    if (buf.counts.isEmpty) null
    else {
      // ascending bucket order: deterministic layout, and the natural
      // order for a cumulative-count quantile walk over the map
      val entries = buf.counts.toArray.sortBy(_._1)
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(e => e._1: Any)),
        new GenericArrayData(entries.map(e => e._2: Any)))
    }

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bb = ByteBuffer.allocate(8 + entries.length * 16)
    bb.putInt(buf.subBucketBits)
    bb.putInt(entries.length)
    entries.foreach { case (bucket, c) => bb.putLong(bucket); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bits = bb.getInt()
    val n = bb.getInt()
    val counts = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { counts.update(bb.getLong(), bb.getLong()); i += 1 }
    new QuantileSketchBuffer(bits, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren(0), kExp = newChildren(1))

  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {

  /** The HDR bucket index of a non-negative value. */
  def bucketOf(v: Long, subBucketBits: Int): Long = {
    val e = if (v == 0L) 0 else 63 - java.lang.Long.numberOfLeadingZeros(v)
    val shift = math.max(0, e - subBucketBits)
    (shift.toLong << subBucketBits) + (v >> shift)
  }

  /** Inverse: the smallest value a bucket contains — the
    * deterministic representative quantile estimates return. */
  def bucketLowerBound(bucket: Long, subBucketBits: Int): Long = {
    val shift = (bucket >> subBucketBits) - 1
    if (shift < 0) bucket // exact region: bucket = value
    else {
      val sub = bucket - (shift << subBucketBits)
      sub << shift
    }
  }
}
