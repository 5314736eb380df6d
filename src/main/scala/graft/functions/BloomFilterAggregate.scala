package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter build + probe for join pre-filtering (SURVEY §2.2
  * joins at scale): build a compact bit-set over the SMALL side's join
  * keys, broadcast it, and drop large-side rows that cannot match
  * BEFORE the shuffle — the classic semi-join reduction. False
  * positives are then removed by the exact join; false negatives are
  * impossible by construction, which is exactly what the q69 gate
  * checks (bloom-prefiltered join result == plain join result).
  *
  * Design notes:
  *  - The buffer is the bit array itself (`Array[Byte]`), bit `b` at
  *    byte `b >>> 3` mask `1 << (b & 7)`; merge is a byte-wise OR and
  *    the probe reads the broadcast bytes directly — no decode step.
  *  - Bit positions come from Kirsch–Mitzenmacher double hashing over
  *    two splitmix64-mixed 64-bit hashes of the key (`h1 + i*h2`) —
  *    fine here because bloom bits need no pairwise independence
  *    across "tables" (unlike the MinHash family, where KM was
  *    measured inadequate and reverted).
  */
object BloomFilter {

  /** splitmix64 finalizer (public-domain mixing constants). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(bits: Array[Byte], key: Long, numHashes: Int): Unit = {
    if (bits.length == 0) return // nothing to set; mirror of the probe guard
    val numBits = bits.length.toLong * 8
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val b = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      bits((b >>> 3).toInt) = (bits((b >>> 3).toInt) | (1 << (b & 7)).toByte).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], key: Long, numHashes: Int): Boolean = {
    // an empty bit set holds nothing — and floorMod by 0 must not
    // reach the hashing below (the SQL function is user-facing and a
    // zero-length BINARY argument is expressible)
    if (bits.length == 0) return false
    val numBits = bits.length.toLong * 8
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val b = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      if ((bits((b >>> 3).toInt) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(key BIGINT, num_bits INT, num_hashes INT) -> BINARY`. */
case class BloomAgg(
    child: Expression,
    numBitsExp: Expression,
    numHashesExp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child, numBitsExp, numHashesExp)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  private def constInt(e: Expression): Int =
    e.eval() match { case n: java.lang.Number => n.intValue(); case _ => -1 }

  private lazy val numBits = constInt(numBitsExp)
  private lazy val numHashes = constInt(numHashesExp)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: key must be BIGINT, got ${child.dataType.sql}")
    } else if (!numBitsExp.foldable || !numHashesExp.foldable ||
        numBitsExp.dataType != IntegerType || numHashesExp.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: num_bits and num_hashes must be constant INT")
    } else if (numBits <= 0 || numBits % 8 != 0 || numBits > (1 << 30)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: num_bits must be a positive multiple of 8 (<= 2^30)")
    } else if (numHashes <= 0 || numHashes > 16) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: num_hashes must be in [1, 16]")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0), numBitsExp = newChildren(1),
      numHashesExp = newChildren(2))

  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(bloom BINARY, key BIGINT, num_hashes INT)` —
  * probe; `num_hashes` must equal the build-side value. The hash count
  * rides as a constant child rather than inside the binary payload so
  * the probe stays a pure function of its arguments. Codegen'd: the
  * probe sits in the large side's scan hot path, so it must not break
  * the whole-stage codegen span. */
case class BloomMightContain(
    bloom: Expression,
    key: Expression,
    numHashesExp: Expression)
  extends TernaryExpression {

  override def first: Expression = bloom
  override def second: Expression = key
  override def third: Expression = numHashesExp
  override def dataType: DataType = BooleanType

  private lazy val numHashes: Int =
    numHashesExp.eval() match { case n: java.lang.Number => n.intValue(); case _ => -1 }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bloom.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bloom must be BINARY, got ${bloom.dataType.sql}")
    } else if (key.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: key must be BIGINT, got ${key.dataType.sql}")
    } else if (!numHashesExp.foldable || numHashesExp.dataType != IntegerType ||
        numHashes <= 0 || numHashes > 16) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: num_hashes must be a constant INT in [1, 16]")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(b: Any, k: Any, nh: Any): Any =
    BloomFilter.mightContain(b.asInstanceOf[Array[Byte]],
      k.asInstanceOf[Long], nh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k, nh) =>
      s"graft.functions.BloomFilter.mightContain($b, $k, $nh)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BloomMightContain =
    copy(bloom = newFirst, key = newSecond, numHashesExp = newThird)

  override def prettyName: String = "bloom_might_contain"
}
