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
}
