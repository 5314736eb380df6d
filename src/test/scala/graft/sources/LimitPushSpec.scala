package graft.sources

import graft.SparkTestBase

/** LIMIT pushdown (`SupportsPushDownLimit`, partial): the scan plans
  * only enough splits to cover the limit's live rows — `SELECT * FROM
  * t LIMIT 100` on a many-file table opens O(1) readers instead of
  * scheduling a task per file. Declared partial, so Spark's own limit
  * still applies (result-invisible); filters (pushed or runtime)
  * disable truncation (post-filter yield per split is unknowable). */
class LimitPushSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_limit").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.glim", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.glim.path", root)
  }

  test("LIMIT plans only the covering prefix of files; exact under " +
      "delete overlays; filters disable truncation") {
    setup()
    spark.sql("DROP TABLE IF EXISTS glim.t")
    spark.sql("CREATE TABLE glim.t (k BIGINT, s STRING)")
    (0 until 8).foreach(i => spark.sql(
      s"""INSERT INTO glim.t
         |SELECT /*+ REPARTITION(1) */ id + ${i * 1000},
         |       md5(cast(id as string)) FROM RANGE(1000)""".stripMargin))
    // 8 files x 1000 rows; LIMIT 1500 needs exactly 2
    ParquetBatchIO.batchReads.set(0)
    assert(spark.sql("SELECT * FROM glim.t LIMIT 1500").collect()
      .length == 1500)
    assert(ParquetBatchIO.batchReads.get() <= 2,
      s"LIMIT 1500 over 1000-row files must open <= 2 readers, " +
        s"opened ${ParquetBatchIO.batchReads.get()}")

    // delete overlay: live counts shrink, the plan covers the limit
    // with one more file when needed — count stays exact
    spark.sql("DELETE FROM glim.t WHERE k < 600") // file 1: 400 live
    ParquetBatchIO.batchReads.set(0)
    assert(spark.sql("SELECT * FROM glim.t LIMIT 1500").collect()
      .length == 1500)
    assert(ParquetBatchIO.batchReads.get() <= 3,
      s"overlay-aware truncation lost: ${ParquetBatchIO.batchReads.get()}")

    // a pushed filter disables truncation but results stay exact
    assert(spark.sql(
      "SELECT * FROM glim.t WHERE k >= 7000 LIMIT 500").collect()
      .length == 500)
    // LIMIT above the table's live count returns everything
    assert(spark.sql("SELECT * FROM glim.t LIMIT 100000").collect()
      .length == 8000 - 600)
  }
}
