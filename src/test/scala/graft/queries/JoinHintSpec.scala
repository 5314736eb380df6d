package graft.queries

import graft.SparkTestBase

/** SQL join-hint surface: the `/*+ BROADCAST(t) */` and
  * `/*+ SHUFFLE_MERGE(t) */` hints a warehouse user carries in their
  * SQL must steer the physical join strategy — and never the
  * result. */
class JoinHintSpec extends SparkTestBase {

  private def plan(sql: String): String = {
    graft.sources.Tables.load(spark, sf0001, "orders")
      .createOrReplaceTempView("orders")
    graft.sources.Tables.load(spark, sf0001, "customer")
      .createOrReplaceTempView("customer")
    spark.sql(sql).queryExecution.executedPlan.toString
  }

  private val body =
    """SELECT c_mktsegment, count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  test("BROADCAST hint forces a broadcast join; SHUFFLE_MERGE forces a sort-merge join") {
    val bc = plan(s"SELECT /*+ BROADCAST(customer) */ ${body.stripPrefix("SELECT ")}")
    assert(bc.contains("BroadcastHashJoin"), bc.take(1500))
    val sm = plan(s"SELECT /*+ SHUFFLE_MERGE(customer) */ ${body.stripPrefix("SELECT ")}")
    assert(sm.contains("SortMergeJoin"), sm.take(1500))
  }

  test("hints are strategy-only: both forms return identical results") {
    def rows(hint: String) = {
      graft.sources.Tables.load(spark, sf0001, "orders")
        .createOrReplaceTempView("orders")
      graft.sources.Tables.load(spark, sf0001, "customer")
        .createOrReplaceTempView("customer")
      spark.sql(s"SELECT $hint ${body.stripPrefix("SELECT ")} ORDER BY c_mktsegment")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val a = rows("/*+ BROADCAST(customer) */")
    val b = rows("/*+ SHUFFLE_MERGE(customer) */")
    assert(a.nonEmpty && a == b)
  }
}
