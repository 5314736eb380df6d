package graft.sources

import graft.SparkTestBase

/** TOP-N pushdown (`SupportsPushDownTopN`, partial): `ORDER BY key
  * LIMIT n` over files RANGE-DISJOINT in the key plans only the
  * covering prefix (ASC) / suffix (DESC) — "latest n events" on a
  * time-clustered table reads one file. Declared partial: Spark
  * re-sorts and limits the served superset, so results never change;
  * overlapping files, nulls in the key, or filters simply plan
  * everything. */
class TopNPushSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_topn").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gtn", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtn.path", root)
  }

  test("ORDER BY LIMIT over range-disjoint files plans the covering " +
      "end; deletes count; overlap and nulls fall back correctly") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gtn.t")
    spark.sql("CREATE TABLE gtn.t (k BIGINT, s STRING)")
    (0 until 8).foreach(i => spark.sql(
      s"""INSERT INTO gtn.t
         |SELECT /*+ REPARTITION(1) */ id + ${i * 1000},
         |       md5(cast(id as string)) FROM RANGE(1000)""".stripMargin))
    // ASC: first 1500 keys live in the first 2 files
    ParquetBatchIO.batchReads.set(0)
    val asc = spark.sql("SELECT k FROM gtn.t ORDER BY k LIMIT 1500")
      .collect().map(_.getLong(0))
    assert(asc.toSeq == (0L until 1500L))
    assert(ParquetBatchIO.batchReads.get() <= 2,
      s"ASC top-1500 must open <= 2 readers, " +
        s"opened ${ParquetBatchIO.batchReads.get()}")
    // DESC: last 500 keys live in the last file
    ParquetBatchIO.batchReads.set(0)
    val desc = spark.sql("SELECT k FROM gtn.t ORDER BY k DESC LIMIT 500")
      .collect().map(_.getLong(0))
    assert(desc.toSeq == (7999L until 7499L by -1))
    assert(ParquetBatchIO.batchReads.get() <= 1,
      s"DESC top-500 must open <= 1 reader, " +
        s"opened ${ParquetBatchIO.batchReads.get()}")
    // delete overlay: the tail file loses 200 live rows; the covering
    // suffix arithmetic must account for it
    spark.sql("DELETE FROM gtn.t WHERE k >= 7800")
    ParquetBatchIO.batchReads.set(0)
    val desc2 = spark.sql("SELECT k FROM gtn.t ORDER BY k DESC LIMIT 900")
      .collect().map(_.getLong(0))
    assert(desc2.toSeq == (7799L until 6899L by -1))
    assert(ParquetBatchIO.batchReads.get() <= 2,
      s"overlay-aware suffix lost: ${ParquetBatchIO.batchReads.get()}")

    // OVERLAPPING files: a ninth file straddling every range — the
    // truncation declines (plans everything), results stay exact
    spark.sql("INSERT INTO gtn.t SELECT /*+ REPARTITION(1) */ " +
      "id * 1000 + 500, 'x' FROM RANGE(8)")
    val asc2 = spark.sql("SELECT k FROM gtn.t ORDER BY k LIMIT 3")
      .collect().map(_.getLong(0))
    assert(asc2.toSeq == Seq(0L, 1L, 2L))

    // NULLS in the key: decline (null ordering would decide), exact
    spark.sql("DROP TABLE IF EXISTS gtn.nl")
    spark.sql("CREATE TABLE gtn.nl (k BIGINT)")
    spark.sql("INSERT INTO gtn.nl SELECT /*+ REPARTITION(1) */ id " +
      "FROM RANGE(100)")
    spark.sql("INSERT INTO gtn.nl VALUES (CAST(NULL AS BIGINT))")
    val withNull = spark.sql("SELECT k FROM gtn.nl ORDER BY k LIMIT 2")
      .collect()
    assert(withNull(0).isNullAt(0) && withNull(1).getLong(0) == 0L,
      "NULLS FIRST default must survive (truncation declined)")
  }
}
