package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** STORAGE-PARTITIONED JOINS (the DSv2 v2-bucketing path): two
  * catalog tables identity-partitioned on the join key report
  * KeyGroupedPartitioning with per-split partition keys, so the join
  * plans with NO shuffle on either side — at 100 TB the difference
  * between a co-located merge and exchanging both tables. Results
  * are pinned against the same join with bucketing disabled. */
class StoragePartitionJoinSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_spj").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftspj",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftspj.path", root)
  }

  private def buildTables(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graftspj.fact")
    spark.sql("DROP TABLE IF EXISTS graftspj.dim")
    spark.sql(
      """CREATE TABLE graftspj.fact (grp STRING, amount BIGINT)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      """CREATE TABLE graftspj.dim (grp STRING, weight BIGINT)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      """INSERT INTO graftspj.fact
        |SELECT concat('g', id % 8), id FROM RANGE(4000)""".stripMargin)
    spark.sql(
      """INSERT INTO graftspj.dim
        |SELECT concat('g', id), id * 100 FROM RANGE(8)""".stripMargin)
  }

  private val joinSql =
    """SELECT f.grp, sum(f.amount * d.weight) AS s
      |FROM graftspj.fact f JOIN graftspj.dim d ON f.grp = d.grp
      |GROUP BY f.grp ORDER BY f.grp""".stripMargin

  test("co-partitioned catalog tables join with NO shuffle on either side") {
    setup()
    buildTables()

    // baseline: v2 bucketing off -> both sides exchange
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val off = spark.sql(joinSql)
    val offRows = off.collect().map(r => (r.getString(0), r.getLong(1)))
    val offPlan = off.queryExecution.executedPlan.toString

    // storage-partitioned: bucketing on -> the JOIN itself plans no
    // exchange (the aggregate above may still shuffle)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val on = spark.sql(joinSql)
    val onRows = on.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(onRows.sameElements(offRows),
      s"SPJ changed results: ${onRows.toSeq} vs ${offRows.toSeq}")
    val onPlan = on.queryExecution.executedPlan.toString
    def exchangesBelowJoin(plan: String): Int = {
      // count Exchange lines BELOW the join operator in the plan tree
      val lines = plan.linesIterator.toVector
      val j = lines.indexWhere(l => l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin"))
      if (j < 0) -1
      else lines.drop(j).count(_.contains("Exchange hashpartitioning"))
    }
    assert(exchangesBelowJoin(offPlan) >= 2,
      s"baseline should exchange both sides:\n$offPlan")
    assert(exchangesBelowJoin(onPlan) == 0,
      s"storage-partitioned join must not exchange:\n$onPlan")
    assert(onPlan.contains("KeyGroupedPartitioning") ||
      !onPlan.contains("Exchange hashpartitioning"), onPlan)

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("an UPDATE overlay withdraws the key-grouped claim (correctness first)") {
    setup()
    buildTables()
    // move one row's partition column under its file: the scan must
    // stop reporting key groups (a patched row sits in the wrong one)
    spark.sql("UPDATE graftspj.fact SET grp = 'g0' WHERE amount = 3001")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = spark.sql(joinSql)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // expected: g1 lost amount 3001 (3001 % 8 = 1... grp was g1), g0
    // gained it — computed against a plain recomputation
    val expect = spark.table("graftspj.fact")
      .join(spark.table("graftspj.dim"), "grp")
      .groupBy("grp").agg(sum(expr("amount * weight")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect, s"$got vs $expect")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      s"patched table must fall back to exchanges:\n$plan")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }
}
