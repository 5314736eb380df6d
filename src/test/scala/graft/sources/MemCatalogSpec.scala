package graft.sources

import graft.SparkTestBase

/** The v2-catalog row-level-operation surface: literal ANSI MERGE
  * INTO / UPDATE / DELETE FROM SQL against a MemCatalog table — the
  * statements a migrating warehouse user keeps verbatim (q194 pins the
  * full CDC changelog against the DuckDB oracle; this spec pins the
  * operation semantics on hand-checked rows). */
class MemCatalogSpec extends SparkTestBase {

  private def freshTable(name: String, rows: String): Unit = {
    spark.conf.set("spark.sql.catalog.graftmem", classOf[MemCatalog].getName)
    // the session CACHES catalog instances on first use — set the
    // durable path here too, so suite ordering can't leave a later
    // suite's graftmem restart tests with a path-less instance
    spark.conf.set("spark.sql.catalog.graftmem.path", MemCatalog.defaultRoot)
    spark.sql(s"DROP TABLE IF EXISTS graftmem.$name")
    spark.sql(s"CREATE TABLE graftmem.$name (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql(s"INSERT INTO graftmem.$name VALUES $rows")
  }

  private def snapshot(name: String): Set[(Long, String, Double)] =
    spark.table(s"graftmem.$name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("MERGE INTO applies delete, update, and insert branches") {
    freshTable("m1", "(1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', 3.5)")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW m1_src AS
        |SELECT * FROM VALUES (2, 'U', 99.0), (3, 'D', 0.0), (9, 'U', 9.9)
        |  AS t(k, op, bal)""".stripMargin)
    spark.sql(
      """MERGE INTO graftmem.m1 t USING m1_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET bal = s.bal
        |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (k, v, bal) VALUES (s.k, 'new', s.bal)
        |""".stripMargin)
    assert(snapshot("m1") ==
      Set((1L, "a", 1.5), (2L, "b", 99.0), (9L, "new", 9.9)))
  }

  test("UPDATE and DELETE FROM route through the same row-level write") {
    freshTable("m2", "(1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)")
    spark.sql("UPDATE graftmem.m2 SET bal = bal + 1 WHERE k >= 2")
    spark.sql("DELETE FROM graftmem.m2 WHERE k = 1")
    assert(snapshot("m2") == Set((2L, "b", 21.0), (3L, "c", 31.0)))
  }

  test("string columns survive the projection copy out of reused row buffers") {
    // UTF8String values point into reused UnsafeRow buffers; the
    // writer must deep-copy them when dropping __row_operation
    freshTable("m3", (1 to 50).map(i => s"($i, 'val_$i', $i.0)").mkString(", "))
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW m3_src AS
        |SELECT id AS k FROM RANGE(10, 20)""".stripMargin)
    spark.sql(
      """MERGE INTO graftmem.m3 t USING m3_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!')
        |""".stripMargin)
    val got = snapshot("m3")
    assert(got.size == 50)
    assert(got.count(_._2.endsWith("!")) == 10)
    assert(got.filter(t => t._1 < 10 || t._1 >= 20)
      .forall(t => t._2 == s"val_${t._1}"))
  }

  test("VERSION AS OF reads exact historical snapshots") {
    freshTable("m4", "(1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql("INSERT INTO graftmem.m4 VALUES (3, 'c', 3.0)")
    spark.sql("DELETE FROM graftmem.m4 WHERE k = 1")
    def at(v: Int) = spark.sql(s"SELECT * FROM graftmem.m4 VERSION AS OF $v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(at(0) == Set.empty)
    assert(at(1) == Set((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(at(2) == Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    assert(at(3) == Set((2L, "b", 2.0), (3L, "c", 3.0)))
    // the live read serves the newest version
    assert(snapshot("m4") == at(3))
    // history is immutable under later writes
    spark.sql("INSERT INTO graftmem.m4 VALUES (9, 'z', 9.0)")
    assert(at(1) == Set((1L, "a", 1.0), (2L, "b", 2.0)))
    // out-of-range versions fail loudly
    val e = intercept[Exception](at(99))
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }

  // ---- Durable snapshot log (the `path` catalog option): commits
  // land as immutable numbered files, so MERGE results AND the full
  // VERSION AS OF history survive a process restart.

  private val durRoot =
    java.nio.file.Files.createTempDirectory("graft_cat_spec").toString

  private def durableCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graftdur", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdur.path", durRoot)
  }

  test("durable catalog: MERGE history and time travel survive a restart") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.d1")
    spark.sql("CREATE TABLE graftdur.d1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.d1 VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql(
      """MERGE INTO graftdur.d1 t
        |USING (SELECT * FROM VALUES (2, 'D', 0.0), (5, 'U', 5.5) AS s(k, op, bal)) s
        |ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET bal = s.bal
        |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (k, v, bal) VALUES (s.k, 'new', s.bal)
        |""".stripMargin)
    def read(sql: String) = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val live = read("SELECT * FROM graftdur.d1")
    val v1 = read("SELECT * FROM graftdur.d1 VERSION AS OF 1")
    assert(live == Set((1L, "a", 1.0), (5L, "new", 5.5)))
    assert(v1 == Set((1L, "a", 1.0), (2L, "b", 2.0)))

    MemCatalog.simulateRestart()
    assert(read("SELECT * FROM graftdur.d1") == live,
      "live state lost across restart")
    assert(read("SELECT * FROM graftdur.d1 VERSION AS OF 1") == v1,
      "historical snapshot lost across restart")
    assert(read("SELECT * FROM graftdur.d1 VERSION AS OF 0").isEmpty)
    // writes resume on the replayed history: version numbering continues
    spark.sql("INSERT INTO graftdur.d1 VALUES (9, 'z', 9.0)")
    assert(read("SELECT * FROM graftdur.d1 VERSION AS OF 2") == live)
    assert(read("SELECT * FROM graftdur.d1") == live + ((9L, "z", 9.0)))
  }

  test("durable catalog: purely in-memory tables do NOT survive (negative control)") {
    durableCatalog()
    freshTable("gone1", "(1, 'a', 1.0)") // graftmem table: check path-less behavior
    val hasPath = spark.conf.getOption("spark.sql.catalog.graftmem.path").isDefined
    spark.sql("DROP TABLE IF EXISTS graftdur.keep1")
    spark.sql("CREATE TABLE graftdur.keep1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.keep1 VALUES (4, 'd', 4.0)")
    MemCatalog.simulateRestart()
    // the durable one is back; a memory-only one is not (when the
    // shared session hasn't already made graftmem durable via a gate)
    assert(spark.table("graftdur.keep1").count() == 1)
    if (!hasPath) {
      val e = intercept[Exception](spark.table("graftmem.gone1").count())
      assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    }
  }

  test("TIMESTAMP AS OF serves the newest snapshot at-or-before, and survives a restart") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.t1")
    spark.sql("CREATE TABLE graftdur.t1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.t1 VALUES (1, 'a', 1.0)")
    Thread.sleep(30) // commit-time resolution is a millisecond
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO graftdur.t1 VALUES (2, 'b', 2.0)")

    // session TZ is UTC, so format the probe timestamp in UTC too
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    val midStr = fmt.format(java.time.Instant.ofEpochMilli(mid))
    def at(ts: String) = spark.sql(
      s"SELECT k FROM graftdur.t1 TIMESTAMP AS OF '$ts'")
      .collect().map(_.getLong(0)).toSet
    assert(at(midStr) == Set(1L), s"at $midStr")
    val nowStr = fmt.format(java.time.Instant.ofEpochMilli(
      System.currentTimeMillis()))
    assert(at(nowStr) == Set(1L, 2L))
    // commit times ride in the log: same answers after a restart
    MemCatalog.simulateRestart()
    assert(at(midStr) == Set(1L))
    assert(at(nowStr) == Set(1L, 2L))
    // a probe before creation fails loudly
    val e = intercept[Exception](at("1999-01-01 00:00:00.000"))
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("snapshot expiry prunes history, bounds the log, and survives a restart") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.e1")
    spark.sql("CREATE TABLE graftdur.e1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.e1 VALUES (1, 'a', 1.0)") // v1
    spark.sql("INSERT INTO graftdur.e1 VALUES (2, 'b', 2.0)") // v2
    spark.sql("INSERT INTO graftdur.e1 VALUES (3, 'c', 3.0)") // v3
    spark.sql("DELETE FROM graftdur.e1 WHERE k = 1")          // v4
    def at(v: Int) = spark.sql(
      s"SELECT k FROM graftdur.e1 VERSION AS OF $v")
      .collect().map(_.getLong(0)).toSet

    MemCatalog.expireSnapshots("graftdur", "e1", before = 3)
    // retained window works, pruned history errors loudly
    assert(at(3) == Set(1L, 2L, 3L) && at(4) == Set(2L, 3L))
    val e = intercept[Exception](at(2))
    assert(e.getMessage.contains("expired"), e.getMessage)
    // on disk: only commits 3 and 4 remain, 3 now self-contained
    val names = java.nio.file.Files.list(
      java.nio.file.Paths.get(durRoot, "e1")).iterator()
    val commits = scala.collection.mutable.ArrayBuffer.empty[String]
    while (names.hasNext) {
      val n = names.next().getFileName.toString
      if (n.endsWith(".commit")) commits += n
    }
    assert(commits.sorted.toSeq ==
      Seq("00000003.commit", "00000004.commit"), commits)

    // a restart replays the pruned log exactly: same window, same
    // errors, and writes continue the version numbering
    MemCatalog.simulateRestart()
    assert(at(3) == Set(1L, 2L, 3L) && at(4) == Set(2L, 3L))
    assert(intercept[Exception](at(1)).getMessage.contains("expired"))
    spark.sql("INSERT INTO graftdur.e1 VALUES (9, 'z', 9.0)") // v5
    assert(at(5) == Set(2L, 3L, 9L))

    // DESCRIBE HISTORY surface: retained versions only, ascending
    // commit times, row counts matching the snapshots
    val h = MemCatalog.history(spark, "graftdur", "e1")
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(h.map(_._1).toSeq == Seq(3L, 4L, 5L), h.mkString(", "))
    assert(h.map(_._3).toSeq == Seq(3L, 2L, 3L))
    assert(h.map(_._2).toSeq == h.map(_._2).sorted.toSeq)
  }

  test("INSERT OVERWRITE replaces atomically as one version") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.o1")
    spark.sql("CREATE TABLE graftdur.o1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.o1 VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql("INSERT OVERWRITE graftdur.o1 VALUES (7, 'x', 7.0)")
    def ks = spark.table("graftdur.o1").collect().map(_.getLong(0)).toSet
    assert(ks == Set(7L))
    // one replace version (v2), not a truncate + append pair
    val h = MemCatalog.history(spark, "graftdur", "o1")
      .orderBy("version").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(h.toSeq == Seq((0L, 0L), (1L, 2L), (2L, 1L)), h.mkString(", "))
    // and the old state is still time-travelable + durable
    assert(spark.sql("SELECT k FROM graftdur.o1 VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    MemCatalog.simulateRestart()
    assert(ks == Set(7L))
  }

  test("ALTER TABLE ADD COLUMN: history pads with NULL, new writes carry it, all durable") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.a1")
    spark.sql("CREATE TABLE graftdur.a1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftdur.a1 VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("ALTER TABLE graftdur.a1 ADD COLUMN bal DOUBLE")     // v2
    def rows(sql: String) = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // pre-evolution rows read the new column as NULL
    assert(rows("SELECT k, v, bal FROM graftdur.a1") ==
      Set((1L, "a", None), (2L, "b", None)))
    spark.sql("INSERT INTO graftdur.a1 VALUES (3, 'c', 3.5)")      // v3
    assert(rows("SELECT k, v, bal FROM graftdur.a1") ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(3.5))))
    // MERGE can update the evolved column
    spark.sql(
      """MERGE INTO graftdur.a1 t
        |USING (SELECT * FROM VALUES (1, 9.9) AS s(k, bal)) s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET bal = s.bal""".stripMargin)  // v4
    assert(rows("SELECT k, v, bal FROM graftdur.a1") ==
      Set((1L, "a", Some(9.9)), (2L, "b", None), (3L, "c", Some(3.5))))
    // the ALTER is its own version; time travel still serves history
    assert(spark.sql("SELECT k FROM graftdur.a1 VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // everything — including the schema change — survives a restart
    MemCatalog.simulateRestart()
    assert(rows("SELECT k, v, bal FROM graftdur.a1") ==
      Set((1L, "a", Some(9.9)), (2L, "b", None), (3L, "c", Some(3.5))))
    assert(spark.table("graftdur.a1").schema.fieldNames.toSeq ==
      Seq("k", "v", "bal"))
    // DROP is metadata-only column mapping now (ColumnMappingSpec);
    // a RETYPE remains unsupported and fails loudly
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graftdur.a1 ALTER COLUMN bal TYPE STRING"))
    assert(e.getMessage.toLowerCase.contains("unsupported") ||
      e.getMessage.contains("alterTable"), e.getMessage)
  }

  test("expiry across a schema change: pruned marker, pre-evolution consolidation, clean replay") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.a2")
    spark.sql("CREATE TABLE graftdur.a2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftdur.a2 VALUES (1, 'a'), (2, 'b')") // v1 (2-col rows)
    spark.sql("ALTER TABLE graftdur.a2 ADD COLUMN bal DOUBLE")     // v2 (marker)
    spark.sql("INSERT INTO graftdur.a2 VALUES (3, 'c', 3.5)")      // v3 (3-col rows)
    // expire past the marker: v2 becomes the oldest retained version,
    // consolidated as a self-contained replace of 2-COLUMN rows
    MemCatalog.expireSnapshots("graftdur", "a2", before = 2)
    MemCatalog.simulateRestart()
    val got = spark.sql("SELECT k, v, bal FROM graftdur.a2").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(3.5))))
    assert(spark.table("graftdur.a2").schema.fieldNames.toSeq ==
      Seq("k", "v", "bal"))
    assert(MemCatalog.history(spark, "graftdur", "a2")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("a 1-key MERGE into an N-row table commits O(delta), not O(N)") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.od1")
    spark.sql("CREATE TABLE graftdur.od1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql(
      """INSERT INTO graftdur.od1
        |SELECT id, concat('v', id), CAST(id AS DOUBLE) FROM RANGE(500)""".stripMargin) // v1
    spark.sql(
      """MERGE INTO graftdur.od1 t
        |USING (SELECT 7 AS k, 99.0 AS bal) s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET bal = s.bal""".stripMargin)      // v2
    spark.sql("DELETE FROM graftdur.od1 WHERE k = 123")                // v3
    // the raw commit log: row-level commits hold ONLY the delta
    val entries =
      CommitLog.open(java.nio.file.Paths.get(durRoot, "od1")).replay()
    val v2 = entries.find(_.version == 2).get.asInstanceOf[DeltaCommit]
    assert(v2.deletes.isEmpty && v2.updates.length == 1 &&
      v2.inserts.isEmpty, v2.toString.take(200))
    val v3 = entries.find(_.version == 3).get.asInstanceOf[DeltaCommit]
    assert(v3.deletes.length == 1 && v3.updates.isEmpty &&
      v3.inserts.isEmpty, v3.toString.take(200))
    // commit files REFERENCE data, never contain it: the 500-row v1
    // commit is O(file refs) — its row bytes live in parquet data
    // files the write tasks streamed — and the delta commits are
    // O(delta). Nothing on the metadata plane scales with the table.
    def sz(v: Int) = java.nio.file.Files.size(
      java.nio.file.Paths.get(durRoot, "od1", f"$v%08d.commit"))
    assert(sz(1) < 2048 && sz(2) < 2048 && sz(3) < 2048,
      s"v1=${sz(1)}B v2=${sz(2)}B v3=${sz(3)}B")
    val v1files = entries.find(_.version == 1).get.asInstanceOf[FileCommit]
    assert(v1files.files.map(_.count).sum == 500L,
      s"v1 must reference 500 rows of data files: ${v1files.files}")
    val dataBytes = v1files.files.map(f =>
      java.nio.file.Files.size(
        java.nio.file.Paths.get(durRoot, "od1", "data", f.name))
    ).sum
    assert(dataBytes > sz(1),
      s"row bytes must live in data files (data=$dataBytes, commit=${sz(1)})")
    // restart replay composes the deltas back to the same state
    def state = spark.table("graftdur.od1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expect = state
    assert(expect.size == 499 && expect.contains((7L, "v7", 99.0)) &&
      !expect.exists(_._1 == 123L))
    MemCatalog.simulateRestart()
    assert(state == expect, "delta replay diverged from the live state")
  }

  test("expiry at a version MIXING pre- and post-ADD-COLUMN rows replays exactly") {
    // the consolidation commit serializes a row vector whose rows have
    // DIFFERENT arities (appended before and after the ALTER); every
    // row must land at the latest arity — projecting at rows.head's
    // width silently dropped post-evolution values
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.a3")
    spark.sql("CREATE TABLE graftdur.a3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftdur.a3 VALUES (1, 'a'), (2, 'b')")   // v1: 2-col rows
    spark.sql("ALTER TABLE graftdur.a3 ADD COLUMN bal DOUBLE")       // v2
    spark.sql("INSERT INTO graftdur.a3 VALUES (3, 'c', 3.5)")        // v3: mixed vector
    spark.sql("INSERT INTO graftdur.a3 VALUES (4, 'd', 4.5)")        // v4
    MemCatalog.expireSnapshots("graftdur", "a3", before = 3)
    MemCatalog.simulateRestart()
    def rows(sql: String) = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows("SELECT k, v, bal FROM graftdur.a3") ==
      Set((1L, "a", None), (2L, "b", None),
        (3L, "c", Some(3.5)), (4L, "d", Some(4.5))),
      "post-evolution value lost through mixed-arity consolidation")
    assert(rows("SELECT k, v, bal FROM graftdur.a3 VERSION AS OF 3") ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(3.5))))
  }

  test("large snapshots scan as ranged partitions; __pos stays global; DML lands correctly") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.par1")
    spark.sql("CREATE TABLE graftdur.par1 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graftdur.par1 SELECT id, concat('v', id) FROM RANGE(20000)")
    val df = spark.table("graftdur.par1")
    assert(df.rdd.getNumPartitions > 1,
      s"20k rows must plan multiple splits, got ${df.rdd.getNumPartitions}")
    // __pos is the row's index in the FULL snapshot, not its slice
    val pos = spark.sql("SELECT __pos FROM graftdur.par1")
      .collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until 20000L),
      s"positions not global: ${pos.take(5).mkString(",")}...")
    // a delta write through the parallel scan targets true positions
    spark.sql(
      """MERGE INTO graftdur.par1 t
        |USING (SELECT id * 997 AS k FROM RANGE(15)) s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = 'hit'""".stripMargin)
    spark.sql("DELETE FROM graftdur.par1 WHERE k >= 19990")
    val got = spark.table("graftdur.par1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 19990)
    (0 until 15).map(_ * 997L).filter(_ < 19990).foreach(k =>
      assert(got(k) == "hit", s"update missed k=$k"))
    assert(got(12345L) == "v12345", "an untouched row changed")
  }

  test("table_changes: full merge matrix (incl. NOT MATCHED BY SOURCE), durable across restart") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.cdf1")
    spark.sql("CREATE TABLE graftdur.cdf1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftdur.cdf1 VALUES (1, 'a'), (2, 'b'), (3, 'c')") // v1
    spark.sql(
      """MERGE INTO graftdur.cdf1 t
        |USING (SELECT * FROM VALUES (2, 'B'), (9, 'Z') AS s(k, v)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
        |""".stripMargin)                                                      // v2
    def feed = graft.sources.MemCatalog
      .tableChanges(spark, "graftdur", "cdf1", 1, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val expect = Set(
      ("insert", 1L, 1L, "a"), ("insert", 1L, 2L, "b"), ("insert", 1L, 3L, "c"),
      ("update_preimage", 2L, 2L, "b"), ("update_postimage", 2L, 2L, "B"),
      ("insert", 2L, 9L, "Z"),
      ("delete", 2L, 3L, "c")) // the NOT MATCHED BY SOURCE branch
    assert(feed == expect, feed.toString)
    // the feed reads off the durable delta log: identical after restart
    MemCatalog.simulateRestart()
    spark.table("graftdur.cdf1").count() // reload the store
    assert(feed == expect, "change feed lost across restart")
    // out-of-range / pruned requests fail loudly
    val e = intercept[Exception](graft.sources.MemCatalog
      .tableChanges(spark, "graftdur", "cdf1", 1, 99).collect())
    assert(e.getMessage.contains("window"), e.getMessage)
  }

  test("table_changes across ADD COLUMN pads pre-evolution pre-images; pruned logs feed from the consolidated base") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.cdf2")
    spark.sql("CREATE TABLE graftdur.cdf2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftdur.cdf2 VALUES (1, 'a'), (2, 'b')")  // v1
    spark.sql("ALTER TABLE graftdur.cdf2 ADD COLUMN bal DOUBLE")      // v2 (marker: no feed rows)
    spark.sql("INSERT INTO graftdur.cdf2 VALUES (3, 'c', 3.5)")       // v3
    spark.sql("UPDATE graftdur.cdf2 SET bal = 9.9 WHERE k = 1")       // v4
    def feed(from: Int, to: Int) = graft.sources.MemCatalog
      .tableChanges(spark, "graftdur", "cdf2", from, to).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    assert(feed(1, 4) == Set(
      ("insert", 1L, 1L, None), ("insert", 1L, 2L, None), // padded NULL
      ("insert", 3L, 3L, Some(3.5)),
      ("update_preimage", 4L, 1L, None),                  // old row: no bal yet
      ("update_postimage", 4L, 1L, Some(9.9))),
      feed(1, 4).toString)

    // expire into the middle: the retained window re-bases, and the
    // feed FROM the base version streams the consolidated snapshot as
    // pure inserts (the streaming initial-load convention)
    MemCatalog.expireSnapshots("graftdur", "cdf2", before = 3)
    val fromBase = feed(3, 4)
    assert(fromBase == Set(
      ("insert", 3L, 1L, None), ("insert", 3L, 2L, None),
      ("insert", 3L, 3L, Some(3.5)),
      ("update_preimage", 4L, 1L, None),
      ("update_postimage", 4L, 1L, Some(9.9))), fromBase.toString)
    // pre-window requests still fail loudly
    val e = intercept[Exception](feed(2, 4))
    assert(e.getMessage.contains("pruned"), e.getMessage)
  }

  test("SHOW TABLES sees durable tables straight after a restart") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.lst1")
    spark.sql("CREATE TABLE graftdur.lst1 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.lst1 VALUES (1, 'a', 1.0)")
    MemCatalog.simulateRestart()
    // no loadTable has run yet — the listing must come from the logs
    val names = spark.sql("SHOW TABLES IN graftdur").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("lst1"), names.toString)
  }

  test("CREATE TABLE AS SELECT lands as create + one append version") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.c1")
    spark.sql(
      """CREATE TABLE graftdur.c1 AS
        |SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS bal FROM RANGE(4)""".stripMargin)
    assert(spark.table("graftdur.c1").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
      Map(0L -> 0.0, 1L -> 1.5, 2L -> 3.0, 3L -> 4.5))
    MemCatalog.simulateRestart()
    assert(spark.table("graftdur.c1").count() == 4)
  }

  test("durable catalog: DROP TABLE destroys the log; crashed .inprogress ignored") {
    durableCatalog()
    spark.sql("DROP TABLE IF EXISTS graftdur.d2")
    spark.sql("CREATE TABLE graftdur.d2 (k BIGINT, v STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graftdur.d2 VALUES (1, 'a', 1.0)")
    // a crashed writer's leftover temp file must not corrupt replay
    val dir = java.nio.file.Paths.get(durRoot, "d2")
    java.nio.file.Files.writeString(
      dir.resolve("00000099.commit.inprogress"), "garbage")
    MemCatalog.simulateRestart()
    assert(spark.table("graftdur.d2").count() == 1)
    spark.sql("DROP TABLE graftdur.d2")
    MemCatalog.simulateRestart()
    val e = intercept[Exception](spark.table("graftdur.d2").count())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }
}
