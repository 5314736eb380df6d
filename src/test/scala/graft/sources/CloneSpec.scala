package graft.sources

import graft.SparkTestBase

/** SHALLOW CLONE + FAST FORWARD (write-audit-publish): zero-copy
  * forks via hard-linked immutable commit/data files, strict
  * per-table ownership (VACUUM on either side cannot break the
  * other), and atomic suffix publication with the create-new
  * linearization every writer uses. */
class CloneSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_clone").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftcl", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcl.path", root)
  }

  test("clone is zero-copy and isolated: writes to the clone leave " +
      "the source untouched, and vice versa") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcl.src1")
    spark.sql("CREATE TABLE graftcl.src1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftcl.src1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graftcl.src1 VALUES (3, 'c')")
    spark.sql("CREATE TABLE graftcl.dev1 SHALLOW CLONE graftcl.src1")
      .collect()
    // no data bytes copied: every clone data file shares its inode
    // with a source file (hard link => same fileKey)
    val srcData = java.nio.file.Paths.get(root, "src1", "data")
    val cloneData = java.nio.file.Paths.get(root, "dev1", "data")
    val srcKeys = java.nio.file.Files.list(srcData).iterator()
    val keys = scala.collection.mutable.Set.empty[Object]
    while (srcKeys.hasNext)
      keys += java.nio.file.Files.readAttributes(srcKeys.next(),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    val cloneFiles = java.nio.file.Files.list(cloneData).iterator()
    while (cloneFiles.hasNext) {
      val p = cloneFiles.next()
      assert(keys.contains(java.nio.file.Files.readAttributes(p,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()),
        s"clone file $p is not a hard link of a source file")
    }
    // isolation both ways
    spark.sql("INSERT INTO graftcl.dev1 VALUES (4, 'd')")
    spark.sql("UPDATE graftcl.dev1 SET v = 'B' WHERE k = 2")
    spark.sql("INSERT INTO graftcl.src1 VALUES (99, 'z')")
    assert(spark.sql("SELECT count(*) FROM graftcl.dev1")
      .head().getLong(0) == 4L)
    assert(spark.sql("SELECT v FROM graftcl.src1 WHERE k = 2")
      .head().getString(0) == "b")
    assert(spark.sql("SELECT count(*) FROM graftcl.src1")
      .head().getLong(0) == 4L) // 3 + the 99 row, no 'd'
    // history travels: the clone time-travels to its base versions
    assert(spark.sql("SELECT count(*) FROM graftcl.dev1 VERSION AS OF 1")
      .head().getLong(0) == 2L)
  }

  test("clone at a tag; VACUUM on the source cannot break the clone " +
      "(link ownership)") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcl.src2")
    spark.sql("CREATE TABLE graftcl.src2 (k BIGINT)")
    spark.sql("INSERT INTO graftcl.src2 VALUES (1), (2)")
    spark.sql("ALTER TABLE graftcl.src2 CREATE TAG base")
    spark.sql("INSERT INTO graftcl.src2 VALUES (3)")
    spark.sql("CREATE TABLE graftcl.dev2 SHALLOW CLONE graftcl.src2 " +
      "VERSION AS OF 'base'").collect()
    assert(spark.sql("SELECT sum(k) FROM graftcl.dev2")
      .head().getLong(0) == 3L)
    // source rewrites + vacuums: clone unaffected (own links)
    spark.sql("ALTER TABLE graftcl.src2 DROP TAG base")
    spark.sql("OPTIMIZE graftcl.src2").collect()
    withConf("spark.sql.ansi.enabled" -> "false") {}
    System.setProperty("graft.vacuum.grace.ms", "0")
    try spark.sql("VACUUM graftcl.src2 RETAIN 1 VERSIONS").collect()
    finally System.clearProperty("graft.vacuum.grace.ms")
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT sum(k) FROM graftcl.dev2")
      .head().getLong(0) == 3L,
      "source VACUUM must not break the clone's cold load")
    assert(spark.sql("SELECT sum(k) FROM graftcl.src2")
      .head().getLong(0) == 6L)
  }

  test("fast forward publishes the audited suffix atomically; " +
      "refused when the target moved") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcl.prod")
    spark.sql("CREATE TABLE graftcl.prod (k BIGINT, ok BOOLEAN)")
    spark.sql("INSERT INTO graftcl.prod VALUES (1, true), (2, true)")
    spark.sql("CREATE TABLE graftcl.wap SHALLOW CLONE graftcl.prod")
      .collect()
    // audit writes land on the clone only
    spark.sql("INSERT INTO graftcl.wap VALUES (3, true)")
    spark.sql("UPDATE graftcl.wap SET ok = false WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM graftcl.prod")
      .head().getLong(0) == 2L)
    // publish: target serves the audited state
    val msg = spark.sql(
      "ALTER TABLE graftcl.prod FAST FORWARD TO graftcl.wap")
      .head().getString(1)
    assert(msg.contains("fast-forwarded from version 1 to 3"), msg)
    val rows = spark.sql("SELECT k, ok FROM graftcl.prod ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(rows == Seq((1L, false), (2L, true), (3L, true)), rows)
    // and survives restart (the links are real commits)
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM graftcl.prod WHERE ok")
      .head().getLong(0) == 2L)

    // a moved target refuses: re-clone is the rebase
    spark.sql("CREATE TABLE graftcl.wap2 SHALLOW CLONE graftcl.prod")
      .collect()
    spark.sql("INSERT INTO graftcl.wap2 VALUES (4, true)")
    spark.sql("INSERT INTO graftcl.prod VALUES (5, true)") // target moves
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graftcl.prod FAST FORWARD TO graftcl.wap2")
        .collect()
    }
    assert(e.getMessage.contains("the target moved") ||
      String.valueOf(e.getCause).contains("the target moved"), e.getMessage)
  }

  test("loud misuse: clone onto an existing table, fast forward from " +
      "a non-clone, schema-change suffix refused") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcl.m1")
    spark.sql("CREATE TABLE graftcl.m1 (k BIGINT)")
    spark.sql("INSERT INTO graftcl.m1 VALUES (1)")
    val dup = intercept[Exception] {
      spark.sql("CREATE TABLE graftcl.m1 SHALLOW CLONE graftcl.m1")
        .collect()
    }
    assert(String.valueOf(dup.getMessage).contains("already"),
      dup.getMessage)
    spark.sql("DROP TABLE IF EXISTS graftcl.m2")
    spark.sql("CREATE TABLE graftcl.m2 (k BIGINT)")
    val nc = intercept[Exception] {
      spark.sql("ALTER TABLE graftcl.m1 FAST FORWARD TO graftcl.m2")
        .collect()
    }
    assert(String.valueOf(nc.getMessage).contains("not a shallow clone"),
      nc.getMessage)
    // schema change on the clone: publish refused loudly
    spark.sql("DROP TABLE IF EXISTS graftcl.m3")
    spark.sql("CREATE TABLE graftcl.m3 SHALLOW CLONE graftcl.m1").collect()
    spark.sql("ALTER TABLE graftcl.m3 ADD COLUMN extra STRING")
    spark.sql("INSERT INTO graftcl.m3 VALUES (2, 'x')")
    val sc = intercept[Exception] {
      spark.sql("ALTER TABLE graftcl.m1 FAST FORWARD TO graftcl.m3")
        .collect()
    }
    assert(String.valueOf(sc.getMessage).contains("schema or partition"),
      sc.getMessage)
  }
}
