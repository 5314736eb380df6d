package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in rewrite of exact `count(DISTINCT x)` to HyperLogLog++ —
  * the classic 100 TB dashboard optimization, applied by the PLANNER
  * so SQL written for a small warehouse runs unchanged at scale.
  *
  * Why a rule and not "just use approx_count_distinct": the query
  * text is often not yours to edit (BI tools, saved dashboards,
  * generated SQL). With `spark.graft.approxDistinct.enabled=true`
  * the session swaps the semantics knowingly — estimates within the
  * HLL++ error bound (~2% at the default 0.05 relativeSD) — and the
  * plan collapses from the exact form's extra distinct-keyed
  * aggregate (partial agg on (keys, x), then count) to ONE standard
  * partial+final aggregate whose upward exchange carries a
  * fixed-size HLL buffer per group instead of every distinct value.
  *
  * Scope guard: only single-argument `Count(distinct x)` is
  * rewritten (any FILTER clause is preserved). Multi-argument
  * distinct counts and other distinct aggregates (sum/avg DISTINCT)
  * are left exact — their approximate forms have different error
  * semantics the user did not opt into. The rule runs in the
  * user-provided batch at the end of optimization; Catalyst's
  * RewriteDistinctAggregates leaves SINGLE distinct aggregates to
  * the physical planner, so the `isDistinct` flag is still visible
  * there. OFF by default.
  */
case class ApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import ApproxDistinctRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get(EnabledKey, "false").toBoolean) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.copy(aggregateExpressions =
          agg.aggregateExpressions.map(rewriteExact))
    }

  private def rewriteExact(ne: NamedExpression): NamedExpression =
    ne.transform {
      case AggregateExpression(Count(Seq(child)), mode, true, filter, id) =>
        AggregateExpression(HyperLogLogPlusPlus(child), mode,
          isDistinct = false, filter, id)
    }.asInstanceOf[NamedExpression]
}

object ApproxDistinctRule {

  val EnabledKey = "spark.graft.approxDistinct.enabled"

  /** Session-local attach + enable (the cluster path is
    * `spark.sql.extensions=graft.GraftExtensions`). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val mine = ApproxDistinctRule(spark)
    if (!spark.experimental.extraOptimizations.contains(mine)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ mine
    }
    spark.conf.set(EnabledKey, "true")
  }

  /** Enable only around `body`, restoring the prior flag after — a
    * later unrelated count(DISTINCT) in the session must stay EXACT
    * unless the user opted in (the q111 scoping lesson). */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val prior = spark.conf.getOption(EnabledKey)
    install(spark)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(EnabledKey, v)
      case None => spark.conf.set(EnabledKey, "false")
    }
  }
}
