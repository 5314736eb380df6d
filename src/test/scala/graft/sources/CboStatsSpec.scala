package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cost-based join planning from the catalog's reported statistics:
  * [[MemScan.estimateStatistics]] serves exact row counts (and a
  * schema-width size estimate) from the commit-log stats sidecars, so
  * Spark's JoinSelection picks BROADCAST for a small catalog dim
  * against a parquet fact WITHOUT a hint — and falls back to
  * sort-merge when the same table's reported size exceeds the
  * threshold. Both plans must return identical rows (statistics steer
  * the plan, never the results). */
class CboStatsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmem.path", MemCatalog.defaultRoot)
    spark.sql("DROP TABLE IF EXISTS graftmem.cbodim")
    spark.sql("CREATE TABLE graftmem.cbodim (r_key INT, r_tag STRING)")
    spark.sql(
      """INSERT INTO graftmem.cbodim VALUES
        |(0, 'alpha'), (1, 'beta'), (2, 'gamma'), (3, 'delta'), (4, 'eps')""".stripMargin)
  }

  private def joined(): DataFrame = {
    val fact = spark.read.parquet(s"$dir/nation.parquet")
    fact.join(spark.table("graftmem.cbodim"),
        fact("n_regionkey") === col("r_key"))
      .groupBy(col("r_tag")).agg(count(lit(1)).as("n"))
      .orderBy(col("r_tag"))
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("reported stats steer broadcast vs sort-merge, results invisible") {
    setup()
    // the scan must REPORT its true size: 5 rows x a few bytes
    val stats = spark.table("graftmem.cbodim").queryExecution
      .optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(5)),
      s"expected exact rowCount=5 from the sidecar fold, got $stats")
    assert(stats.sizeInBytes < 10000, s"tiny dim reported huge: $stats")

    // default threshold (10 MB): the 5-row dim broadcasts, no hint
    val bhj = joined()
    val bhjPlan = planOf(bhj)
    assert(bhjPlan.contains("BroadcastHashJoin"),
      s"expected a stats-driven broadcast:\n$bhjPlan")
    val expect = bhj.collect().toSeq

    // squeeze the threshold under the reported size: same query now
    // plans a shuffle join — the DECISION demonstrably reads the stats
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val smj = joined()
      val smjPlan = planOf(smj)
      assert(!smjPlan.contains("BroadcastHashJoin"),
        s"threshold 1B must forbid the broadcast:\n$smjPlan")
      assert(smj.collect().toSeq == expect,
        "join strategy changed the results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("an empty catalog table reports zero rows, not unknown") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftmem.cboempty")
    spark.sql("CREATE TABLE graftmem.cboempty (k BIGINT)")
    val stats = spark.table("graftmem.cboempty").queryExecution
      .optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(0)), stats.toString)
  }
}
