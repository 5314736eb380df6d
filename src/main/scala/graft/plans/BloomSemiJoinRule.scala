package graft.plans

import graft.functions.{BloomAgg, BloomMightContain}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite `large LEFT SEMI JOIN small ON lk = rk`
  * into `Filter(bloom_might_contain(<bloom over small's rk>, lk))`
  * above the large side, keeping the exact semi-join on top — the
  * bloom prunes non-matching rows inside the large side's scan stage
  * BEFORE the join's exchange, the same shape Spark's own
  * InjectRuntimeFilter emits (the bloom rides a scalar subquery that
  * the planner executes once and broadcasts).
  *
  * The whole-plan rewrite is the Catalyst `Rule[LogicalPlan]` entry
  * point of this library (SURVEY §2.2 "custom operators" option (c)),
  * registered cluster-wide by [[graft.GraftExtensions]] and locally
  * via `spark.experimental.extraOptimizations`. OFF by default —
  * enable with `spark.graft.bloomSemiJoin.enabled=true`; correctness
  * is semantics-preserving either way (false positives are removed by
  * the retained exact join; no false negatives by construction,
  * proven in `BloomSemiJoinRuleSpec` and by q69's gate on the manual
  * form).
  *
  * Expected interaction, observed through the real extensions path:
  * `InferFiltersFromConstraints` propagates the probe across the join
  * equality onto the BUILD side too. That twin is always-true (every
  * build key is in its own bloom), costs one probe per build row, and
  * its scalar subquery is the SAME instance (deduplicated by subquery
  * reuse at physical planning) — harmless, and the batch still
  * reaches a fixed point because this rule's subtree guard stops any
  * further insertion.
  */
case class BloomSemiJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.bloomSemiJoin.enabled"
  val MaxBuildBytesKey = "spark.graft.bloomSemiJoin.maxBuildBytes"
  private val NumBits = 1 << 20 // 128 KB of bits: ~1% fp up to ~10^5 keys
  private val NumHashes = 5

  private def enabled: Boolean =
    spark.conf.get(EnabledKey, "false").toBoolean

  /** Build-side guard: past this estimated size the bit set would
    * saturate (probe always true) and the extra aggregate of the
    * build side prunes nothing — the same reason Spark's
    * InjectRuntimeFilter gates on creation-side size. */
  private def maxBuildBytes: Long =
    spark.conf.get(MaxBuildBytesKey, (8L * 1024 * 1024).toString).toLong

  /** Registered via injectOptimizerRule, this runs inside the
    * FIXED-POINT operator-optimization batch where PushDownPredicates
    * relocates the inserted Filter between iterations — so the
    * already-done check must search the whole left SUBTREE for a
    * probe on the same key, not just the join's immediate child
    * (an immediate-child check re-fires every iteration and stacks
    * blooms until the batch's iteration cap). */
  private def alreadyFiltered(plan: LogicalPlan, key: Expression): Boolean =
    plan.exists {
      case Filter(cond, _) =>
        cond.exists {
          case BloomMightContain(_, k, _) => k.semanticEquals(key)
          case _ => false
        }
      case _ => false
    }

  private def bloomOver(side: LogicalPlan, key: Expression): Expression = {
    val agg = Alias(AggregateExpression(
      BloomAgg(key, Literal(NumBits), Literal(NumHashes)),
      Complete, isDistinct = false), "graft_bloom")()
    ScalarSubquery(Aggregate(Nil, Seq(agg), side))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, LeftSemi, Some(EqualTo(lk: AttributeReference,
          rk: AttributeReference)), _)
          if lk.dataType == LongType && rk.dataType == LongType &&
            left.outputSet.contains(lk) && right.outputSet.contains(rk) &&
            right.stats.sizeInBytes <= maxBuildBytes &&
            !alreadyFiltered(left, lk) =>
        val probe = BloomMightContain(bloomOver(right, rk), lk, Literal(NumHashes))
        j.copy(left = Filter(probe, left))
    }
}
