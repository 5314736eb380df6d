package graft.plans

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class ApproxDistinctRuleSpec extends SparkTestBase {
  import spark.implicits._

  private def df = (1L to 5000L).map(i => (i % 7, s"v${i % 400}"))
    .toDF("k", "x")

  test("flag off: count(DISTINCT) stays exact and untouched") {
    val q = df.groupBy(col("k")).agg(countDistinct(col("x")).as("n"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("hyperloglog") && !opt.contains("HyperLogLog"), opt)
    assert(q.collect().forall(_.getLong(1) == 400L))
  }

  test("flag on: single count(DISTINCT) rewrites to HLL++ and estimates within bound") {
    ApproxDistinctRule.scoped(spark) {
      val q = df.groupBy(col("k")).agg(countDistinct(col("x")).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("hyperloglog") || opt.contains("approx_count_distinct"), opt)
      // the exact form's extra distinct-keyed aggregate disappears:
      // only ONE pair of partial/final aggregates remains
      val physical = q.queryExecution.executedPlan.toString
      assert("HashAggregate".r.findAllIn(physical).size == 2, physical)
      // 400 distinct per group; HLL++ at default sd is well within 5%
      q.collect().foreach { r =>
        assert(math.abs(r.getLong(1) - 400L) * 20 <= 400L, r.toString)
      }
    }
    // scoping restored: the next query is exact again
    val after = df.groupBy(col("k")).agg(countDistinct(col("x")).as("n"))
    assert(after.collect().forall(_.getLong(1) == 400L))
  }

  test("flag on: multi-argument and non-Count distincts stay exact") {
    ApproxDistinctRule.scoped(spark) {
      val multi = df.groupBy(col("k"))
        .agg(countDistinct(col("x"), col("k")).as("n"))
      assert(!multi.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hyperloglog"))
      assert(multi.collect().forall(_.getLong(1) == 400L))
      val sd = (1L to 100L).map(i => (i % 5)).toDF("v")
        .agg(sum_distinct(col("v")).as("s"))
      assert(sd.collect().head.getLong(0) == 10L) // 0+1+2+3+4 exact
    }
  }

  test("FILTER clauses survive the rewrite") {
    ApproxDistinctRule.scoped(spark) {
      df.createOrReplaceTempView("adr_t")
      val got = spark.sql(
        "SELECT count(DISTINCT x) FILTER (WHERE k = 0) AS n FROM adr_t")
        .collect().head.getLong(0)
      // the k=0 stratum's multiples of 7 cover all 400 residues mod
      // 400 (gcd(7,400)=1), so the filtered true distinct count is 400
      assert(math.abs(got - 400L) * 10 <= 400L, s"got=$got")
    }
  }
}
