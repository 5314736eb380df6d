package graft.core

import java.nio.ByteBuffer
import java.util.Random
import scala.collection.mutable

/** Fixed-width or variable-width wire format for one reservoir value
  * type. The reference hand-packs its state structs per type
  * (`median.cc:51-86,113-115`); here the codec is the only per-type
  * serialization knowledge and the reservoir itself is generic. */
trait ValueCodec[T] extends Serializable {
  def write(buf: ByteBuffer, v: T): Unit
  def read(buf: ByteBuffer): T
  def size(v: T): Int
}

/** Bounded reservoir-sample state for approximate-median / sampling
  * aggregates, generic over the sampled value type.
  *
  * Re-expresses (not ports) the semantics of the reference UDA state
  * machine in `scalingdata/rocana-impala-udfs` `median.cc:88-304`:
  *
  *  - Algorithm-R insert with an INCLUSIVE random draw on
  *    `[0, sourceSize]` (reference `median.cc:107-110,149-155`).
  *  - NULL inputs are skipped by the caller and never reach [[insert]],
  *    so they do not count toward [[sourceSize]] (`median.cc:130`).
  *  - Just before a partial state is shipped (Spark: `serialize`),
  *    every still-unkeyed sample gets a weight key
  *    `(n - rand(k)) / n` in `((n-k)/n, 1]` so that a later merge can
  *    keep samples proportionally to stream size (`median.cc:176-192`).
  *  - Merge keeps the `maxSamples` highest-keyed samples via a
  *    min-heap on key, O(k log k) (`median.cc:228-282`), and sums
  *    `sourceSize`.
  *  - Median = value-sorted element at 0-based index `n/2` — the UPPER
  *    middle for even n, no interpolation (`median.cc:299-301`).
  *    Exact whenever `maxSamples >=` number of non-null inputs.
  *
  * The type parameter realizes the reference's latent per-type
  * comparators (`median.cc:196-221` — generic `<`, StringVal memcmp,
  * DecimalVal int128, TimestampVal date-then-time): ordering is
  * supplied by the caller per value type, exactly the generalization
  * the dead C++ template specializations were reaching for. (The
  * reference's 10-byte string-sample truncation, `median.cc:49,67-86`,
  * is NOT mirrored — it would corrupt results; full values are kept.)
  *
  * State is O(maxSamples) per aggregation group regardless of input
  * size — the property that makes the aggregate safe at 100 TB scale.
  */
final class Reservoir[T](
    var maxSamples: Int,
    var sourceSize: Long,
    val values: mutable.ArrayBuffer[T],
    val keys: mutable.ArrayBuffer[Double],
    val rng: Random) extends Serializable {

  def numSamples: Int = values.length

  /** Algorithm-R insert of one non-null value. */
  def insert(v: T, k: Int): Unit = {
    if (k > maxSamples) maxSamples = k // growth tolerated (median.cc:157-162)
    if (values.length < maxSamples) {
      values += v
      keys += Reservoir.Unkeyed
    } else {
      // Inclusive draw on [0, sourceSize], replicating GetNext64's
      // documented off-by-one-friendly range (median.cc:107-110).
      val r = Reservoir.nextLongInclusive(rng, sourceSize)
      if (r < maxSamples) {
        values(r.toInt) = v
        keys(r.toInt) = Reservoir.Unkeyed
      }
    }
    sourceSize += 1
  }

  /** Assign weight keys to unkeyed samples; call at partial-output
    * (serialize) time, mirroring `median.cc:176-192`. */
  def assignKeys(): Unit = {
    val n = numSamples
    if (n == 0) return
    var i = 0
    while (i < n) {
      if (keys(i) < 0) {
        val r = rng.nextInt(n) // rand() % num_samples
        keys(i) = (sourceSize - r).toDouble / sourceSize.toDouble
      }
      i += 1
    }
  }

  /** Weighted merge: keep the maxSamples highest-keyed samples.
    * Both sides must already have keys assigned. */
  def merge(other: Reservoir[T]): Unit = {
    if (other.maxSamples > maxSamples) maxSamples = other.maxSamples
    // min-heap on key over current samples (median.cc:263-269)
    implicit val byKeyMin: Ordering[(T, Double)] =
      Ordering.by[(T, Double), Double](_._2).reverse
    val heap = mutable.PriorityQueue.empty[(T, Double)]
    var i = 0
    while (i < values.length) { heap.enqueue((values(i), keys(i))); i += 1 }
    i = 0
    while (i < other.values.length) {
      if (heap.size < maxSamples) {
        heap.enqueue((other.values(i), other.keys(i)))
      } else if (heap.nonEmpty && other.keys(i) > heap.head._2) {
        heap.dequeue()
        heap.enqueue((other.values(i), other.keys(i)))
      }
      i += 1
    }
    values.clear(); keys.clear()
    heap.foreach { case (v, k) => values += v; keys += k }
    sourceSize += other.sourceSize
  }

  /** Upper-middle median of the current samples; None for empty state
    * (SQL NULL, median.cc:295-298). */
  def medianUpper(implicit ord: Ordering[T]): Option[T] =
    if (values.isEmpty) None
    else Some(values.sorted.apply(values.length / 2))

  /** Value-sorted copy of the samples (deterministic output order). */
  def sortedSamples(implicit ord: Ordering[T]): Seq[T] = values.toSeq.sorted

  def serializeTo(codec: ValueCodec[T]): Array[Byte] = {
    val n = numSamples
    var payload = 0
    var i = 0
    while (i < n) { payload += codec.size(values(i)) + 8; i += 1 }
    val buf = ByteBuffer.allocate(4 + 8 + 4 + payload)
    buf.putInt(maxSamples)
    buf.putLong(sourceSize)
    buf.putInt(n)
    i = 0
    while (i < n) {
      codec.write(buf, values(i))
      buf.putDouble(keys(i))
      i += 1
    }
    buf.array()
  }
}

object Reservoir {
  /** Sentinel for a sample that has not been assigned a merge key yet
    * (reference uses -1, median.cc:57). Keys are always > 0 once set. */
  val Unkeyed: Double = -1.0

  def empty[T](maxSamples: Int, seed: Long): Reservoir[T] =
    new Reservoir[T](maxSamples, 0L, mutable.ArrayBuffer.empty,
      mutable.ArrayBuffer.empty, new Random(seed))

  def deserializeFrom[T](bytes: Array[Byte], codec: ValueCodec[T]): Reservoir[T] = {
    val buf = ByteBuffer.wrap(bytes)
    val maxSamples = buf.getInt
    val sourceSize = buf.getLong
    val n = buf.getInt
    val values = new mutable.ArrayBuffer[T](n)
    val keys = new mutable.ArrayBuffer[Double](n)
    var i = 0
    while (i < n) {
      values += codec.read(buf)
      keys += buf.getDouble
      i += 1
    }
    // RNG state need not survive the wire: a deserialized state only
    // merges (no inserts), and key assignment already happened.
    new Reservoir[T](maxSamples, sourceSize, values, keys,
      new Random(sourceSize ^ (n.toLong << 32)))
  }

  /** Codec for the reference's one exported value type (DoubleVal,
    * median.h:44). */
  object DoubleCodec extends ValueCodec[Double] {
    def write(buf: ByteBuffer, v: Double): Unit = buf.putDouble(v)
    def read(buf: ByteBuffer): Double = buf.getDouble
    def size(v: Double): Int = 8
  }

  /** Uniform draw on the INCLUSIVE range [0, max] (median.cc:107-110). */
  private[core] def nextLongInclusive(rng: Random, max: Long): Long = {
    if (max <= 0) 0L
    else {
      val bound = max + 1
      var bits = 0L; var v = 0L
      do {
        bits = rng.nextLong() >>> 1
        v = bits % bound
      } while (bits - v + (bound - 1) < 0)
      v
    }
  }
}
