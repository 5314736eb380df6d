package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.IntegerType

/** Shared plumbing for `f(value, k)`-shaped TypedImperativeAggregates
  * (the reservoir family and the bounded top-k heaps): [[ValueOps]]
  * resolution for the value child, and validation + extraction of the
  * constant positive-INT `k` parameter. Mirrors the reference's
  * constant-arg DCHECKs (`/root/reference/median.cc:135-141`) as
  * analysis-time `checkInputDataTypes` failures.
  */
trait ConstantKAggregate[B] extends TypedImperativeAggregate[B] {

  def child: Expression
  def kExp: Expression

  /** The k parameter's user-facing name in error messages. */
  protected def kName: String = "k"

  override def children: Seq[Expression] = Seq(child, kExp)
  override def nullable: Boolean = true

  @transient protected lazy val ops: ValueOps =
    ValueOps.forType(child.dataType).getOrElse(throw new IllegalStateException(
      s"$prettyName: unsupported value type ${child.dataType.sql}"))

  protected lazy val k: Int = kExp.eval() match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$prettyName: $kName must be an integer constant, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ValueOps.forType(child.dataType).isEmpty) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unsupported value type ${child.dataType.sql} " +
          "(expected numeric, string, decimal, date or timestamp)")
    } else if (kExp.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: $kName must be INT, got ${kExp.dataType.sql}")
    } else if (!kExp.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: $kName must be a constant (foldable) expression")
    } else if (kExp.eval() == null || k <= 0) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: $kName must be a positive integer")
    } else TypeCheckResult.TypeCheckSuccess
  }
}
