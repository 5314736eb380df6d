package graft.sources

import graft.SparkTestBase

/** GROUP BY partition-column aggregate pushdown: the per-partition
  * census (`SELECT day, count(*) ... GROUP BY day`) answers from
  * commit metadata — one row per tuple folded from per-file stats,
  * zero data rows touched. Declines under overlays, filters,
  * non-identity transforms, or non-partition grouping columns. */
class GroupedAggPushSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_gagg").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gga", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gga.path", root)
  }

  test("per-partition census serves from metadata, zero rows decoded") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gga.ev")
    spark.sql(
      """CREATE TABLE gga.ev (day STRING, k BIGINT, v DOUBLE)
        |PARTITIONED BY (day)""".stripMargin)
    spark.sql(
      """INSERT INTO gga.ev
        |SELECT concat('d', id % 3), id, id * 1.5 FROM RANGE(3000)
        |""".stripMargin)
    // a second write: multiple files per tuple must still fold
    spark.sql("INSERT INTO gga.ev VALUES ('d1', -1, -1.0)")
    MemScan.aggPushGroupedServed.set(0)
    ParquetBatchIO.batchReads.set(0)
    MemFilters.evaluated.set(0)
    val got = spark.sql(
      """SELECT day, count(*) AS n, count(v) AS nv, min(k) AS mn,
        |       max(k) AS mx
        |FROM gga.ev GROUP BY day ORDER BY day""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("d0", 1000L, 1000L, 0L, 2997L),
      ("d1", 1001L, 1001L, -1L, 2998L),
      ("d2", 1000L, 1000L, 2L, 2999L)), got)
    assert(MemScan.aggPushGroupedServed.get() == 1L,
      "grouped aggregate must be metadata-served")
    assert(ParquetBatchIO.batchReads.get() == 0L &&
      MemFilters.evaluated.get() == 0L, "no data rows may be touched")
    // the metadata answer tracks DML exactly (overlay -> decline path)
    spark.sql("DELETE FROM gga.ev WHERE k = 0")
    MemScan.aggPushGroupedServed.set(0)
    val after = spark.sql(
      "SELECT day, count(*) AS n FROM gga.ev GROUP BY day ORDER BY day")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(after == Seq(("d0", 999L), ("d1", 1001L), ("d2", 1000L)))
    assert(MemScan.aggPushGroupedServed.get() == 0L,
      "overlaid snapshot must decline to the scan path")
  }

  test("declines: filters, non-partition column, subset still serves") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gga.m")
    spark.sql(
      """CREATE TABLE gga.m (a STRING, b STRING, k BIGINT)
        |PARTITIONED BY (a, b)""".stripMargin)
    spark.sql(
      """INSERT INTO gga.m
        |SELECT concat('a', id % 2), concat('b', id % 2), id
        |FROM RANGE(100)""".stripMargin)
    // SUBSET of the partition columns groups tuples correctly
    MemScan.aggPushGroupedServed.set(0)
    val sub = spark.sql(
      "SELECT a, count(*) AS n FROM gga.m GROUP BY a ORDER BY a")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sub == Seq(("a0", 50L), ("a1", 50L)))
    assert(MemScan.aggPushGroupedServed.get() == 1L)
    // a pushed filter over a NON-partition column declines (the scan
    // answers)
    MemScan.aggPushGroupedServed.set(0)
    assert(spark.sql(
      "SELECT a, count(*) AS n FROM gga.m WHERE k >= 50 GROUP BY a")
      .collect().map(_.getLong(1)).sum == 50L)
    assert(MemScan.aggPushGroupedServed.get() == 0L)
    // a filter over PARTITION columns evaluates exactly on the tuples
    // — whole files keep/drop, still metadata-served, zero decode
    MemScan.aggPushGroupedServed.set(0)
    ParquetBatchIO.batchReads.set(0)
    val filtered = spark.sql(
      """SELECT a, count(*) AS n FROM gga.m
        |WHERE b = 'b1' GROUP BY a ORDER BY a""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(filtered == Seq(("a1", 50L)), filtered)
    assert(MemScan.aggPushGroupedServed.get() == 1L,
      "partition-column filter must stay metadata-served")
    assert(ParquetBatchIO.batchReads.get() == 0L)
    // grouping by a NON-partition column declines
    MemScan.aggPushGroupedServed.set(0)
    assert(spark.sql(
      "SELECT k % 2 AS p, count(*) AS n FROM gga.m GROUP BY k % 2")
      .collect().length == 2)
    assert(MemScan.aggPushGroupedServed.get() == 0L)
  }
}
