package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Depth x width counter grid. */
final class CountMinBuffer(val width: Int, val counters: Array[Long])

/** `count_min(value, width) -> ARRAY<BIGINT>` — the count-min sketch
  * (Cormode & Muthukrishnan 2005) over STRING values, completing the
  * mergeable-summaries family next to `bloom_agg` (membership),
  * `heavy_hitters` (frequent items) and HLL (cardinality): a
  * fixed-size frequency table answering "about how often does ANY
  * key occur in this 100 TB stream" without holding the key set.
  *
  * Layout: [[CountMinAgg.Depth]] rows x `width` counters, flattened
  * row-major (cell (d, i) at index d*width + i). Every update
  * increments one counter per row, so estimates NEVER underestimate
  * and each row independently sums to the total item count — the two
  * deterministic invariants the spec pins. MERGE is element-wise
  * addition (counters are plain sums), which makes the sketch exactly
  * partial-aggregation-shaped: map-side partials combine before the
  * shuffle and the exchange carries Depth x width longs per
  * partition, the same incremental contract as the reference UDA
  * (`median.h:42-50`).
  *
  * The row hashes are the repo's standard replayable md5-slice family
  * (first 7 hex digits of md5("cm<d>:" + value) mod width — 28 bits,
  * exact in BIGINT), so the ENTIRE sketch is reproducible in ANSI SQL:
  * the q105 gate hash-compares every counter cell against a DuckDB
  * replay, a stronger statement than the usual probabilistic-bound
  * gates.
  */
case class CountMinAgg(
    child: Expression,
    kExp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ConstantKAggregate[CountMinBuffer] {

  override protected def kName: String = "width"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess if child.dataType != StringType =>
        TypeCheckResult.TypeCheckFailure(
          s"count_min: value must be STRING (the hash family is defined " +
            s"on strings), got ${child.dataType.sql}")
      case other => other
    }

  /** Row d's cell for a value: first 7 hex digits of
    * md5("cm<d>:" + value), mod width — identical to the SQL replay
    * `('0x' || substr(md5('cm' || d || ':' || t), 1, 7))::BIGINT % w`.
    * (MessageDigest is stateful, hence the per-thread instance —
    * expression trees can be shared across local-mode task threads.)
    *
    * DELIBERATE perf trade-off: one MD5 + one string build per depth
    * row (4x per input) keeps the hash family byte-replayable in the
    * DuckDB grid oracle. A production-tuned variant would hash the
    * value ONCE and derive the Depth cells from one digest — changing
    * the oracle SQL in lockstep — for ~4x update throughput. */
  private def cell(d: Int, v: UTF8String): Int = {
    val digest = CountMinAgg.md5.get().digest(
      (s"cm$d:" + v.toString).getBytes(StandardCharsets.UTF_8))
    // 7 hex digits = first 3.5 bytes, big-endian
    val bits28 = ((digest(0) & 0xffL) << 20) | ((digest(1) & 0xffL) << 12) |
      ((digest(2) & 0xffL) << 4) | ((digest(3) & 0xf0L) >> 4)
    (bits28 % k).toInt
  }

  override def createAggregationBuffer(): CountMinBuffer =
    new CountMinBuffer(k, new Array[Long](CountMinAgg.Depth * k))

  override def update(buf: CountMinBuffer, input: InternalRow): CountMinBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < CountMinAgg.Depth) {
        buf.counters(d * buf.width + cell(d, s)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: CountMinBuffer, other: CountMinBuffer): CountMinBuffer = {
    var i = 0
    while (i < buf.counters.length) {
      buf.counters(i) += other.counters(i)
      i += 1
    }
    buf
  }

  override def eval(buf: CountMinBuffer): Any =
    new GenericArrayData(buf.counters.map(c => c: Any))

  override def serialize(buf: CountMinBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.counters.length)
    bb.putInt(buf.width)
    buf.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountMinBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val w = bb.getInt
    val counters = new Array[Long](CountMinAgg.Depth * w)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong; i += 1 }
    new CountMinBuffer(w, counters)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0), kExp = newChildren(1))

  override def prettyName: String = "count_min"
}

object CountMinAgg {
  /** Fixed number of hash rows; the error PROBABILITY knob
    * ((1/2)^Depth for the 2n/width bound). The width argument is the
    * error MAGNITUDE knob, which is the one worth exposing. */
  val Depth = 4

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
