package graft.sources

import graft.SparkTestBase

/** Recoverable DROP (`UNDROP TABLE`, the Delta model) + `DESCRIBE
  * HISTORY`: DROP moves a durable table's log directory to `.trash/`
  * (one atomic rename), UNDROP restores the newest incarnation with
  * full history/time travel, DROP ... PURGE destroys immediately, and
  * old trash entries purge past the retention grace. */
class UndropSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_undrop").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftud", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftud.path", root)
  }

  test("DROP + UNDROP round-trips content, history, and time travel") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftud.u1")
    spark.sql("CREATE TABLE graftud.u1 (k BIGINT)")
    spark.sql("INSERT INTO graftud.u1 VALUES (1), (2)")
    spark.sql("INSERT INTO graftud.u1 VALUES (3)")
    spark.sql("DROP TABLE graftud.u1")
    intercept[Exception] { spark.table("graftud.u1").collect() }
    spark.sql("UNDROP TABLE graftud.u1").collect()
    assert(spark.sql("SELECT sum(k) FROM graftud.u1").head().getLong(0)
      == 6L)
    assert(spark.sql("SELECT count(*) FROM graftud.u1 VERSION AS OF 1")
      .head().getLong(0) == 2L, "history must travel through the trash")
    // DESCRIBE HISTORY shows the retained versions
    val hist = spark.sql("DESCRIBE HISTORY graftud.u1")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(hist.map(_._1) == Seq(0L, 1L, 2L) &&
      hist.last._2 == 3L, hist)
  }

  test("the NEWEST incarnation restores; PURGE bypasses the trash; " +
      "misuse is loud") {
    setup()
    // two drop generations of the same name: UNDROP gets the newest
    spark.sql("DROP TABLE IF EXISTS graftud.u2")
    spark.sql("CREATE TABLE graftud.u2 (k BIGINT)")
    spark.sql("INSERT INTO graftud.u2 VALUES (10)")
    spark.sql("DROP TABLE graftud.u2")
    Thread.sleep(5) // distinct trash timestamps
    spark.sql("CREATE TABLE graftud.u2 (k BIGINT)")
    spark.sql("INSERT INTO graftud.u2 VALUES (20), (21)")
    spark.sql("DROP TABLE graftud.u2")
    spark.sql("UNDROP TABLE graftud.u2").collect()
    assert(spark.sql("SELECT sum(k) FROM graftud.u2").head().getLong(0)
      == 41L, "newest incarnation must win")
    // UNDROP refuses while a live table holds the name
    val live = intercept[Exception] {
      spark.sql("UNDROP TABLE graftud.u2").collect()
    }
    assert(String.valueOf(live.getMessage).contains("live table"),
      live.getMessage)
    // PURGE leaves nothing to undrop
    spark.sql("DROP TABLE IF EXISTS graftud.u3")
    spark.sql("CREATE TABLE graftud.u3 (k BIGINT)")
    spark.sql("DROP TABLE graftud.u3 PURGE")
    val gone = intercept[Exception] {
      spark.sql("UNDROP TABLE graftud.u3").collect()
    }
    assert(String.valueOf(gone.getMessage).contains("trash"),
      gone.getMessage)
  }

  test("trash entries purge past the retention grace") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftud.u4")
    spark.sql("CREATE TABLE graftud.u4 (k BIGINT)")
    spark.sql("DROP TABLE graftud.u4")
    // age every entry past a zero grace: the NEXT drop purges them
    System.setProperty("graft.trash.retention.ms", "0")
    try {
      Thread.sleep(5)
      spark.sql("CREATE TABLE graftud.u4 (k BIGINT)")
      spark.sql("DROP TABLE graftud.u4")
      // the older incarnation is gone; only the newest survives its
      // own drop instant (also past grace 0 on the NEXT sweep)
      Thread.sleep(5)
      spark.sql("CREATE TABLE graftud.u5 (k BIGINT)")
      spark.sql("DROP TABLE graftud.u5")
      val trash = java.nio.file.Paths.get(root, ".trash")
      val left = java.nio.file.Files.list(trash)
      val names = try {
        val b = Seq.newBuilder[String]
        val it = left.iterator()
        while (it.hasNext) b += it.next().getFileName.toString
        b.result()
      } finally left.close()
      assert(!names.exists(_.startsWith("u4-")),
        s"grace-expired entries must purge: $names")
    } finally System.clearProperty("graft.trash.retention.ms")
  }
}
