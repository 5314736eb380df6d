package graft.sources

import graft.SparkTestBase

/** The `.history` and `.files` metadata tables: `DESCRIBE HISTORY`
  * and the live data-file inventory through plain SQL (the Iceberg
  * `db.table.<meta>` suffix). Both read O(metadata) — no data file is
  * ever opened. */
class MetaTablesSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_meta").toString

  test(".history and .files serve store metadata through plain SQL") {
    spark.conf.set("spark.sql.catalog.graftmt", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmt.path", root)
    spark.sql("DROP TABLE IF EXISTS graftmt.t")
    spark.sql("CREATE TABLE graftmt.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftmt.t SELECT id, concat('x', id) FROM RANGE(100)") // v1
    spark.sql("INSERT INTO graftmt.t VALUES (999, 'tail')")                       // v2
    spark.sql("DELETE FROM graftmt.t WHERE k IN (3, 5)")                          // v3
    spark.sql("UPDATE graftmt.t SET v = 'hit' WHERE k = 7")                       // v4

    // history == the DESCRIBE HISTORY helper, through SQL text
    val h = spark.sql(
      "SELECT version, n_rows FROM graftmt.t.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(h == Seq((0L, 0L), (1L, 100L), (2L, 101L), (3L, 99L), (4L, 99L)), h)
    val helper = MemCatalog.history(spark, "graftmt", "t")
      .selectExpr("version", "n_rows").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(h == helper)

    // files: one segment per v1 write-task file plus v2's file, with
    // the delete/patch overlay sizes where they landed; all names
    // real parquet files on disk
    val f = spark.sql(
      """SELECT seg, file, n_rows, n_live, n_deleted, n_patched
        |FROM graftmt.t.files ORDER BY seg""".stripMargin).collect()
    assert(f.forall(!_.isNullAt(1)), "durable segments must be files")
    assert(f.map(_.getLong(2)).sum == 101L, f.mkString(", "))
    assert(f.map(_.getLong(3)).sum == 99L)
    assert(f.map(_.getLong(4)).sum == 2L, "two deleted rows")
    assert(f.map(_.getLong(5)).sum == 1L, "one patched row")
    // the overlay sits in the segment(s) holding k = 3, 5, 7 — the
    // FIRST v1 file — while v2's 1-row file is untouched
    assert(f.last.getLong(2) == 1L && f.last.getLong(3) == 1L)
    f.foreach(r => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "t", "data", r.getString(1))),
      s"listed file missing on disk: ${r.getString(1)}"))

    // a column-pruned read and an aggregate work like any table
    assert(spark.sql("SELECT sum(n_live) AS s FROM graftmt.t.files")
      .head().getLong(0) == 99L)
  }
}
