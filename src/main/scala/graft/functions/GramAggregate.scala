package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `gram_sums(qv, d) -> ARRAY<BIGINT>` — the exact integer scatter
  * summary of a quantized vector corpus in ONE aggregate pass:
  * `[n, S_1..S_d, G_11, G_12, .., G_dd]` with `G` the upper triangle
  * of Σ qᵢqⱼ, row-major (d(d+1)/2 cells). Everything downstream of a
  * PCA/whitening pipeline (covariance, power iteration) derives from
  * this one array.
  *
  * Why an aggregate and not an explode+groupBy: the update is a tight
  * primitive-long loop over d(d+1)/2 products per row — no 2080
  * intermediate struct rows per input row, no exchange of O(rows)
  * anything. The buffer is a single long array; MERGE is element-wise
  * addition, so the sketch is exactly partial-aggregation-shaped: the
  * exchange carries `1 + d + d(d+1)/2` longs per map partition
  * regardless of corpus size, and every sum is an order-free exact
  * integer (the q264/q269 determinism contract).
  */
final class GramBuffer(val d: Int, val sums: Array[Long])

case class GramAgg(
    child: Expression,
    dExp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child, dExp)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_sums"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val d: Int = dExp.eval() match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"gram_sums: d must be an integer constant, got $other")
  }
  private def bufLen: Int = 1 + d + d * (d + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (dExp.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(
          s"gram_sums: d must be INT, got ${dExp.dataType.sql}")
      else if (!dExp.foldable)
        TypeCheckResult.TypeCheckFailure(
          "gram_sums: d must be a constant (foldable) expression")
      else if (dExp.eval() == null || d <= 0 || d > 1024)
        TypeCheckResult.TypeCheckFailure(
          "gram_sums: d must be a positive integer <= 1024")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_sums: value must be ARRAY<BIGINT> (quantized vector), " +
        s"got ${other.sql}")
  }

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(d, new Array[Long](bufLen))

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == d,
        s"gram_sums: expected $d elements, got ${arr.numElements()}")
      val q = arr.toLongArray()
      val s = buf.sums
      s(0) += 1L
      var i = 0
      var p = 1 + d
      while (i < d) {
        val qi = q(i)
        s(1 + i) += qi
        var j = i
        while (j < d) {
          s(p) += qi * q(j)
          p += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    val a = buf.sums
    val b = other.sums
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    buf
  }

  override def eval(buf: GramBuffer): Any = new GenericArrayData(buf.sums)

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.sums.length)
    bb.putInt(buf.d)
    buf.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val dd = bb.getInt
    val n = 1 + dd + dd * (dd + 1) / 2
    val sums = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) = bb.getLong; i += 1 }
    new GramBuffer(dd, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren(0), dExp = newChildren(1))
}
