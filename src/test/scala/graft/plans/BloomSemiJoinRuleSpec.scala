package graft.plans

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class BloomSemiJoinRuleSpec extends SparkTestBase {

  private lazy val rule = BloomSemiJoinRule(spark)

  private def withRule[T](enabled: Boolean)(f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    spark.conf.set(rule.EnabledKey, enabled.toString)
    try f
    finally {
      spark.conf.set(rule.EnabledKey, "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == rule)
    }
  }

  private def semiJoin = {
    import spark.implicits._
    val big = (1L to 5000L).toDF("k")
    val small = (1L to 5000L).filter(_ % 50 == 0).toDF("j")
    big.join(small, col("k") === col("j"), "left_semi")
  }

  test("enabled: the optimizer inserts a bloom prefilter, results unchanged") {
    val expected = semiJoin.collect().map(_.getLong(0)).sorted.toSeq
    withRule(enabled = true) {
      val df = semiJoin
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_might_contain"), optimized)
      assert(optimized.contains("bloom_agg"), optimized)
      val got = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected, "the rewrite must be result-invisible")
    }
  }

  test("disabled (default): the plan is untouched") {
    withRule(enabled = false) {
      val optimized = semiJoin.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("bloom_might_contain"), optimized)
    }
  }

  test("idempotent: a second optimizer pass does not stack filters") {
    withRule(enabled = true) {
      val once = rule(semiJoin.queryExecution.optimizedPlan)
      val twice = rule(once)
      assert(once == twice, "re-applying the rule must be a no-op")
    }
  }

  test("fixed-point safe: interleaving with predicate pushdown never stacks blooms") {
    // the production registration (injectOptimizerRule) lands in the
    // fixed-point operator batch where PushDownPredicates MOVES the
    // inserted Filter below intervening Projects between iterations —
    // simulate that interleaving and require exactly one probe
    import org.apache.spark.sql.catalyst.optimizer.PushDownPredicates
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.functions.BloomMightContain
    import spark.implicits._
    spark.conf.set(rule.EnabledKey, "true")
    try {
      val big = (1L to 1000L).toDF("k").select(col("k"), lit(1).as("extra"))
      val small = (1L to 20L).toDF("j")
      var p = big.join(small, col("k") === col("j"), "left_semi")
        .queryExecution.analyzed
      for (_ <- 1 to 5) p = PushDownPredicates(rule(p))
      val probes = p.collect {
        case f: LFilter if f.condition.exists(_.isInstanceOf[BloomMightContain]) => f
      }
      assert(probes.size == 1,
        s"expected exactly one bloom probe after 5 interleaved passes, got ${probes.size}:\n$p")
    } finally spark.conf.set(rule.EnabledKey, "false")
  }

  test("oversized build sides are left alone (saturation guard)") {
    withRule(enabled = true) {
      spark.conf.set(rule.MaxBuildBytesKey, "1")
      try {
        val optimized = semiJoin.queryExecution.optimizedPlan.toString
        assert(!optimized.contains("bloom_might_contain"), optimized)
      } finally spark.conf.unset(rule.MaxBuildBytesKey)
    }
  }
}
