package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time SimHash kernel invoked from generated code — the
  * whole token loop runs as one JVM call per row instead of one
  * Catalyst higher-order-function closure per (token, bit) pair.
  * Bit-identical to the HOF formulation in [[TextSketches.simhash]]
  * (pinned by `TextSketchesSpec`): token hash = first 15 md5 hex
  * chars as a 60-bit integer; bit j of the sketch is set when the
  * sum of +/-1 votes from each token's bit j is >= 0. */
object SimHashKernel {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash60(text: UTF8String): Long = {
    // limit -1 matches Spark's split(): trailing empty tokens kept
    val tokens = text.toString.split(" ", -1)
    val votes = new Array[Int](TextSketches.SimHashBits)
    val md = md5.get()
    var ti = 0
    while (ti < tokens.length) {
      val h = md.digest(tokens(ti).getBytes("UTF-8"))
      // first 15 hex chars = first 60 bits: big-endian first 8 bytes,
      // dropping the low nibble
      var be = 0L
      var bi = 0
      while (bi < 8) { be = (be << 8) | (h(bi) & 0xffL); bi += 1 }
      val th = be >>> 4
      var j = 0
      while (j < TextSketches.SimHashBits) {
        votes(j) += (if (((th >>> j) & 1L) != 0) 1 else -1)
        j += 1
      }
      ti += 1
    }
    var out = 0L
    var j = 0
    while (j < TextSketches.SimHashBits) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `simhash60(text)` — codegen'd 60-bit frequency-weighted SimHash
  * (SURVEY §2.3 near-dup sketches). The HOF formulation interprets a
  * closure per (token, bit); this expression keeps the sketch inside
  * whole-stage codegen with one kernel call per row — the difference
  * between a scan-speed sketch and a CPU bottleneck at 100 TB. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60: argument must be STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(t: Any): Any =
    SimHashKernel.simhash60(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.SimHashKernel.simhash60($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
