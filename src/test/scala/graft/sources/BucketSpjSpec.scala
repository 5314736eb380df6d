package graft.sources

import graft.SparkTestBase

/** BUCKET storage-partitioned joins (the Iceberg bucket-SPJ case):
  * two catalog tables partitioned `bucket(n, k)` report
  * KeyGroupedPartitioning over a TransformExpression that resolves
  * through the catalog's FunctionCatalog (`graft.bucket` — the
  * write-side Murmur3/pmod hash itself), so the join plans with NO
  * exchange on either side. Mismatched bucket counts fall back to
  * exchanges; results are pinned against bucketing-off. */
class BucketSpjSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_bspj").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftbspj",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftbspj.path", root)
  }

  private def build(dimBuckets: Int): Unit = {
    spark.sql("DROP TABLE IF EXISTS graftbspj.fact")
    spark.sql("DROP TABLE IF EXISTS graftbspj.dim")
    spark.sql(
      """CREATE TABLE graftbspj.fact (k BIGINT, amount BIGINT)
        |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(
      s"""CREATE TABLE graftbspj.dim (k BIGINT, weight BIGINT)
         |PARTITIONED BY (bucket($dimBuckets, k))""".stripMargin)
    spark.sql(
      "INSERT INTO graftbspj.fact SELECT id % 40, id FROM RANGE(4000)")
    spark.sql(
      "INSERT INTO graftbspj.dim SELECT id, id * 100 FROM RANGE(40)")
  }

  private val joinSql =
    """SELECT f.k, sum(f.amount * d.weight) AS s
      |FROM graftbspj.fact f JOIN graftbspj.dim d ON f.k = d.k
      |GROUP BY f.k ORDER BY f.k""".stripMargin

  private def exchangesBelowJoin(plan: String): Int = {
    val lines = plan.linesIterator.toVector
    val j = lines.indexWhere(l => l.contains("SortMergeJoin") ||
      l.contains("ShuffledHashJoin"))
    if (j < 0) -1
    else lines.drop(j).count(_.contains("Exchange hashpartitioning"))
  }

  test("bucket(8, k)-partitioned tables join with zero exchanges") {
    setup()
    build(dimBuckets = 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = spark.sql(joinSql)
      val offRows = off.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(exchangesBelowJoin(off.queryExecution.executedPlan.toString)
        >= 2)

      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val on = spark.sql(joinSql)
      val onRows = on.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(onRows.sameElements(offRows),
        s"bucket SPJ changed results: ${onRows.take(5).toSeq}...")
      val onPlan = on.queryExecution.executedPlan.toString
      assert(exchangesBelowJoin(onPlan) == 0,
        s"bucket storage-partitioned join must not exchange:\n$onPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    }
  }

  test("mismatched bucket counts fall back to exchanges, results exact") {
    setup()
    build(dimBuckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val df = spark.sql(joinSql)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      // every fact row matches exactly one dim row: 4000 rows over 40
      // keys -> 40 output groups
      assert(rows.length == 40)
      assert(exchangesBelowJoin(df.queryExecution.executedPlan.toString)
        >= 2, "bucket(8) x bucket(4) must exchange")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    }
  }

  test("the bucket function resolves via SQL too") {
    setup()
    // the FunctionCatalog surface: callable as a scalar function
    val b = spark.sql("SELECT graftbspj.bucket(8, CAST(17 AS BIGINT))")
      .head().getInt(0)
    assert(b == Partitioning.bucketOf(17L,
      org.apache.spark.sql.types.LongType, 8), s"got $b")
  }
}
