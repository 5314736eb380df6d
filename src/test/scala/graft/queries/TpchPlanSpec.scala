package graft.queries

import graft.SparkTestBase

/** The TPC-H sweep's value at 100 TB is the PLAN, not the answer:
  * selective predicates must reach the parquet scan, dimension sides
  * must broadcast, and IN/EXISTS subqueries must decorrelate to
  * semi-joins instead of per-row subquery execution. These assertions
  * pin the plan shapes so a regression (e.g. a cast blocking pushdown,
  * a stats change defeating the broadcast) fails loudly.
  */
class TpchPlanSpec extends SparkTestBase {

  private def planOf(name: String): String = {
    val d = TpchQueries.defs.find(_.name == name).get
    d.run(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("q88 (Q6): all three lineitem predicates are pushed to the scan") {
    // plan toString truncates the PushedFilters list; read the scan
    // node's metadata instead
    val d = TpchQueries.defs.find(_.name == "q88_sql_tpch_q6").get
    // (sparkPlan, not executedPlan: AQE's wrapper hides its children
    // from collect until execution)
    val scan = d.run(spark, sf0001).queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pushed = scan.metadata("PushedFilters")
    // date bounds, discount band, and the quantity cap all push
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThanOrEqual(l_discount,0.07)") &&
      pushed.contains("LessThan(l_quantity,24.0)"), pushed)
    // and the scan reads only the referenced columns
    val read = scan.metadata("ReadSchema")
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(read.contains) && !read.contains("l_orderkey"), read)
  }

  test("q91 (Q10): dimension joins broadcast; no shuffle of customer/nation") {
    val plan = planOf("q91_sql_tpch_q10")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the returned-lines filter reaches the lineitem scan
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.take(3000))
  }

  test("q95 (Q18): the IN + HAVING subquery decorrelates to a semi-join") {
    val plan = planOf("q95_sql_tpch_q18")
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("q98 (Q4): the correlated EXISTS decorrelates to a semi-join") {
    val plan = planOf("q98_sql_tpch_q4")
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("q92 (Q13): the outer join survives with its extra join predicate") {
    val plan = planOf("q92_sql_tpch_q13")
    assert(plan.contains("LeftOuter"), plan.take(3000))
  }
}
