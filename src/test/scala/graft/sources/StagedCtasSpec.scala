package graft.sources

import graft.SparkTestBase

/** Atomic CTAS / RTAS ([[MemCatalog]] as a `StagingTableCatalog`):
  * the new table builds in an invisible `.staging/` directory and
  * publishes by directory move — a failed CTAS leaves NOTHING (no
  * empty husk), and `REPLACE TABLE ... AS SELECT` keeps the old table
  * readable until the new one is complete (crash leaves either old or
  * new, never neither). */
class StagedCtasSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_ctas").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftst", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftst.path", root)
  }

  test("CTAS lands atomically; a failing CTAS leaves NO table behind") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftst.c1")
    spark.sql("CREATE TABLE graftst.c1 AS " +
      "SELECT id AS k, id * 2 AS v FROM range(100)")
    assert(spark.sql("SELECT sum(v) FROM graftst.c1").head().getLong(0)
      == 9900L)
    // durable: replays from the published directory
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM graftst.c1").head().getLong(0)
      == 100L)

    // failing CTAS: the write job dies mid-query → no husk, no dir
    spark.sql("DROP TABLE IF EXISTS graftst.c2")
    intercept[Exception] {
      spark.sql("CREATE TABLE graftst.c2 AS " +
        "SELECT id, CAST(assert_true(id < 10, 'boom') AS STRING) AS x " +
        "FROM range(100000)").collect()
    }
    val e = intercept[Exception] {
      spark.table("graftst.c2").collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.contains("cannot be found"), e.getMessage)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "graftst.c2")) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(root, "c2")),
      "failed CTAS must leave no directory")
  }

  test("REPLACE TABLE AS SELECT keeps the old table until the new one " +
      "publishes; CREATE OR REPLACE works on absent tables") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftst.r1")
    spark.sql("CREATE TABLE graftst.r1 AS SELECT id AS k FROM range(10)")
    spark.sql("REPLACE TABLE graftst.r1 AS " +
      "SELECT id AS k, 'new' AS tag FROM range(3)")
    val rows = spark.sql("SELECT k, tag FROM graftst.r1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((0L, "new"), (1L, "new"), (2L, "new")), rows)
    // a FAILING replace leaves the OLD table intact
    intercept[Exception] {
      spark.sql("REPLACE TABLE graftst.r1 AS " +
        "SELECT CAST(assert_true(id < 1, 'kill') AS STRING) AS z " +
        "FROM range(100000)").collect()
    }
    assert(spark.sql("SELECT count(*) FROM graftst.r1").head().getLong(0)
      == 3L, "failed REPLACE must keep the previous table")
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM graftst.r1").head().getLong(0)
      == 3L)
    // CREATE OR REPLACE on a missing table = plain create
    spark.sql("DROP TABLE IF EXISTS graftst.r2")
    spark.sql("CREATE OR REPLACE TABLE graftst.r2 AS " +
      "SELECT id FROM range(4)")
    assert(spark.sql("SELECT count(*) FROM graftst.r2").head().getLong(0)
      == 4L)
    // plain REPLACE on a missing table still refuses
    spark.sql("DROP TABLE IF EXISTS graftst.r3")
    intercept[Exception] {
      spark.sql("REPLACE TABLE graftst.r3 AS SELECT id FROM range(2)")
    }
  }

  test("partitioned CTAS stages and publishes with tuples intact") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftst.p1")
    spark.sql("CREATE TABLE graftst.p1 PARTITIONED BY (side) AS " +
      "SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END " +
      "AS side FROM range(100)")
    val parts = spark.sql(
      "SELECT partition, n_rows FROM graftst.p1.partitions ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(parts.map(_._2).sum == 100L && parts.length == 2, parts)
    // partition pruning works on the published table
    assert(spark.table("graftst.p1")
      .where("side = 'even'").count() == 50L)
  }
}
