package graft.sources

import graft.SparkTestBase

/** Named refs (tags): immutable name → version pointers over the
  * commit log — human time travel (`VERSION AS OF 'stable'`),
  * reproducibility anchors, and expiry PINS (VACUUM refuses to drop a
  * tagged version). Persisted in the `_refs` sidecar; survive
  * restart; `.refs` is the census metadata table. */
class RefsSpec extends SparkTestBase {

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmem.path", MemCatalog.defaultRoot)
  }

  test("tag resolution: VERSION AS OF 'tag' reads the pinned snapshot; " +
      ".refs lists it") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftmem.tagt")
    spark.sql("CREATE TABLE graftmem.tagt (k BIGINT)")
    spark.sql("INSERT INTO graftmem.tagt VALUES (1), (2)") // v1
    spark.sql("ALTER TABLE graftmem.tagt CREATE TAG after_first")
    spark.sql("INSERT INTO graftmem.tagt VALUES (3), (4)") // v2
    val tagged = spark.sql(
      "SELECT sum(k) AS s FROM graftmem.tagt VERSION AS OF 'after_first'")
      .head().getLong(0)
    assert(tagged == 3L, s"tag must pin v1: $tagged")
    val live = spark.sql("SELECT sum(k) AS s FROM graftmem.tagt")
      .head().getLong(0)
    assert(live == 10L)
    val refs = spark.sql("SELECT name, version FROM graftmem.tagt.refs")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(refs == Map("after_first" -> 1L), refs)
  }

  test("tagged versions pin expiry: VACUUM refuses, DROP TAG releases") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftmem.tagv")
    spark.sql("CREATE TABLE graftmem.tagv (k BIGINT)")
    spark.sql("INSERT INTO graftmem.tagv VALUES (1)") // v1
    spark.sql("INSERT INTO graftmem.tagv VALUES (2)") // v2
    spark.sql("ALTER TABLE graftmem.tagv CREATE TAG pin VERSION AS OF 1")
    spark.sql("INSERT INTO graftmem.tagv VALUES (3)") // v3
    val e = intercept[Exception] {
      spark.sql("VACUUM graftmem.tagv RETAIN 1 VERSIONS").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("pinned by tags"),
      e.getMessage)
    spark.sql("ALTER TABLE graftmem.tagv DROP TAG pin")
    spark.sql("VACUUM graftmem.tagv RETAIN 1 VERSIONS").collect()
    assert(spark.sql("SELECT count(*) FROM graftmem.tagv")
      .head().getLong(0) == 3L)
  }

  test("RESTORE by tag; tags survive restart via the _refs sidecar") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftmem.tagr")
    spark.sql("CREATE TABLE graftmem.tagr (k BIGINT)")
    spark.sql("INSERT INTO graftmem.tagr VALUES (10)") // v1
    spark.sql("ALTER TABLE graftmem.tagr CREATE TAG clean")
    spark.sql("INSERT INTO graftmem.tagr VALUES (99)") // v2 (bad load)
    MemCatalog.simulateRestart()
    // the sidecar replays with the log
    spark.sql("RESTORE TABLE graftmem.tagr VERSION AS OF 'clean'").collect()
    val rows = spark.sql("SELECT k FROM graftmem.tagr")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(10L), rows)
  }

  test("loud misuse: duplicate tag, purely-numeric name, unknown tag, " +
      "out-of-window version") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftmem.tage")
    spark.sql("CREATE TABLE graftmem.tage (k BIGINT)")
    spark.sql("INSERT INTO graftmem.tage VALUES (1)")
    spark.sql("ALTER TABLE graftmem.tage CREATE TAG once")
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE graftmem.tage CREATE TAG once")
    }
    assert(dup.getMessage.contains("immutable"), dup.getMessage)
    // the maintenance grammar itself rejects a numeric tag name
    intercept[Exception] {
      spark.sql("ALTER TABLE graftmem.tage CREATE TAG 123")
    }
    val unknown = intercept[Exception] {
      spark.sql("SELECT * FROM graftmem.tage VERSION AS OF 'nosuch'")
        .collect()
    }
    assert(unknown.getMessage.contains("no such tag"), unknown.getMessage)
    val oow = intercept[Exception] {
      spark.sql("ALTER TABLE graftmem.tage CREATE TAG far VERSION AS OF 99")
    }
    assert(oow.getMessage.contains("outside the retained window"),
      oow.getMessage)
  }
}
