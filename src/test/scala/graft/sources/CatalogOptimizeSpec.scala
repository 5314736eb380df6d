package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** OPTIMIZE [ZORDER BY] on file-backed catalog tables + per-file-stats
  * FILE SKIPPING. Pins:
  *
  *  1. the rewrite is content-INVISIBLE (same rows, new layout) and
  *     `dataChange = false`: the change feed emits NOTHING for the
  *     optimize version, and a streaming follower receives nothing;
  *  2. bin-packing lands ~count/target files, each carrying its OWN
  *     stats in the commit;
  *  3. after ZORDER BY (a, b), a range predicate on EITHER key plans
  *     strictly fewer splits than the file count — the scan skipped
  *     whole files from their stats without opening them;
  *  4. file skipping is overlay-safe: an UPDATE that patches a value
  *     INTO a file whose stats contradict the predicate suppresses
  *     the skip (stats describe the file, not the overlay);
  *  5. time travel and restart replay keep working across the
  *     optimize; expiry physically reclaims the pre-optimize files.
  */
class CatalogOptimizeSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_opt").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftopt", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftopt.path", root)
  }

  private def planned(sql: String): Int =
    spark.sql(sql).rdd.getNumPartitions

  test("OPTIMIZE ZORDER BY: invisible rewrite, no CDF rows, file skipping on both keys") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftopt.t1")
    spark.sql("CREATE TABLE graftopt.t1 (a BIGINT, b BIGINT, payload BIGINT)")
    // 100x100 grid, both keys equally hot; single-task insert = ONE
    // file, so pre-optimize there is nothing to skip
    spark.sql(
      """INSERT INTO graftopt.t1
        |SELECT id % 100, id DIV 100, id FROM RANGE(10000)""".stripMargin) // v1
    val before = spark.table("graftopt.t1").orderBy("payload").collect()

    MemCatalog.optimizeTable(spark, "graftopt", "t1",
      targetFileRows = 700, zorderBy = Seq("a", "b"))                     // v2

    // 1) content-invisible...
    val after = spark.table("graftopt.t1").orderBy("payload").collect()
    assert(after.sameElements(before), "OPTIMIZE changed the content")
    // ...and dataChange = false: the feed for v2 is EMPTY while v1's
    // inserts are still there
    assert(MemCatalog.tableChanges(spark, "graftopt", "t1", 2, 2).count() == 0L,
      "a dataChange-false rewrite must emit no change rows")
    assert(MemCatalog.tableChanges(spark, "graftopt", "t1", 1, 2).count() == 10000L)

    // 2) bin-packed files, each with stats in the commit
    val entries = CommitLog.open(java.nio.file.Paths.get(root, "t1")).replay()
    val v2 = entries.find(_.version == 2).get.asInstanceOf[FileCommit]
    assert(v2.mode == FileCommit.Rewrite, s"mode=${v2.mode}")
    assert(v2.files.length >= 10 && v2.files.length <= 20,
      s"~15 bin-packed files expected, got ${v2.files.length}")
    assert(v2.files.forall(_.stats.isDefined), "per-file stats missing")

    // 3) file skipping on BOTH curve keys: a narrow range plans fewer
    // splits than the file count; the unfiltered scan plans all
    val total = planned("SELECT payload FROM graftopt.t1")
    assert(total == v2.files.length, s"$total vs ${v2.files.length}")
    val prunedA = planned(
      "SELECT payload FROM graftopt.t1 WHERE a >= 10 AND a <= 19")
    val prunedB = planned(
      "SELECT payload FROM graftopt.t1 WHERE b >= 80 AND b <= 89")
    assert(prunedA < total, s"a-range must skip files: $prunedA/$total")
    assert(prunedB < total, s"b-range must skip files: $prunedB/$total")
    // skipping is result-invisible
    assert(spark.sql(
      "SELECT count(*) AS n, sum(payload) AS s FROM graftopt.t1 " +
        "WHERE a >= 10 AND a <= 19").head().toSeq ==
      spark.sql(
        "SELECT count(*), sum(payload) FROM graftopt.t1 " +
          "WHERE a + 0 >= 10 AND a + 0 <= 19").head().toSeq)

    // 4) overlay safety: patch a = 999999 into some file whose stats
    // say a <= 99 — the predicate must still FIND it (no stats skip
    // over patched segments)
    spark.sql("UPDATE graftopt.t1 SET a = 999999 WHERE payload = 5000") // v3
    assert(spark.sql("SELECT payload FROM graftopt.t1 WHERE a = 999999")
      .head().getLong(0) == 5000L,
      "file skip must not hide an UPDATE-patched row")

    // 5) durability + time travel across the optimize; expiry reclaims
    // the pre-optimize file
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) AS n FROM graftopt.t1 VERSION AS OF 1")
      .head().getLong(0) == 10000L)
    assert(spark.table("graftopt.t1").count() == 10000L)
    val v1Names = entries.find(_.version == 1).get.asInstanceOf[FileCommit]
      .files.map(_.name).toSet
    MemCatalog.expireSnapshots("graftopt", "t1", before = 2)
    val left = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "t1", "data"))
      try {
        val it = s.iterator()
        val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.result()
      } finally s.close()
    }
    assert(v1Names.forall(n => !left.contains(n)),
      s"pre-optimize files must be vacuumed: kept ${left.intersect(v1Names)}")
    assert(spark.table("graftopt.t1").count() == 10000L)
  }

  test("a streaming follower receives NOTHING for an optimize rewrite") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftopt.s1")
    spark.sql("CREATE TABLE graftopt.s1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftopt.s1 SELECT id, concat('x', id) FROM RANGE(500)")
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val ckpt = java.nio.file.Files.createTempDirectory("opt_ck").toString
    val q = spark.readStream.table("graftopt.s1").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    q.processAllAvailable()
    val afterLoad = seen.size()
    assert(afterLoad == 500, s"initial load: $afterLoad")
    MemCatalog.optimizeTable(spark, "graftopt", "s1", targetFileRows = 100)
    spark.sql("INSERT INTO graftopt.s1 VALUES (777777, 'tail')")
    q.processAllAvailable()
    q.stop()
    val fresh = seen.size() - afterLoad
    assert(fresh == 1,
      s"the follower must see only the real insert, got $fresh new rows")
  }

  test("OPTIMIZE CURVE HILBERT: fewer splits on ALL clustered keys, content-invisible") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftopt.h1")
    spark.sql("CREATE TABLE graftopt.h1 (a BIGINT, b BIGINT, payload BIGINT)")
    spark.sql(
      """INSERT INTO graftopt.h1
        |SELECT id % 100, id DIV 100, id FROM RANGE(10000)""".stripMargin)
    val before = spark.table("graftopt.h1").orderBy("payload").collect()
    MemCatalog.optimizeTable(spark, "graftopt", "h1",
      targetFileRows = 700, zorderBy = Seq("a", "b"), curve = "hilbert")
    assert(spark.table("graftopt.h1").orderBy("payload").collect()
      .sameElements(before), "hilbert OPTIMIZE changed the content")
    val files = spark.sql("SELECT count(*) AS n FROM graftopt.h1.files")
      .head().getLong(0).toInt
    val total = planned("SELECT payload FROM graftopt.h1")
    assert(total == files, s"$total vs $files")
    val prunedA = planned(
      "SELECT payload FROM graftopt.h1 WHERE a >= 10 AND a <= 19")
    val prunedB = planned(
      "SELECT payload FROM graftopt.h1 WHERE b >= 80 AND b <= 89")
    assert(prunedA < total, s"a-range must skip files: $prunedA/$total")
    assert(prunedB < total, s"b-range must skip files: $prunedB/$total")
    // dataChange = false: the hilbert rewrite is feed-invisible too
    val v = spark.sql("SELECT max(version) AS v FROM graftopt.h1.history")
      .head().getLong(0).toInt
    assert(MemCatalog.tableChanges(spark, "graftopt", "h1", v, v)
      .count() == 0L, "hilbert rewrite must emit no change rows")
  }
}
