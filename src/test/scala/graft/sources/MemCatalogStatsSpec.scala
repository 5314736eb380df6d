package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame

/** Aggregate pushdown served from the commit-log stats sidecars: the
  * metadata-only COUNT/MIN/MAX path of a lakehouse (Delta `add.stats`
  * analog). The pushed plan must contain NO aggregate operator — the
  * scan answers with one row — and every decline path must fall back
  * to a plain scan with identical results.
  */
class MemCatalogStatsSpec extends SparkTestBase {

  private def setupCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmem.path", MemCatalog.defaultRoot)
  }

  private def pushed(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("HashAggregate") && !plan.contains("SortAggregate")
  }

  private def createAndFill(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graftmem.$table")
    spark.sql(s"CREATE TABLE graftmem.$table (k BIGINT, c BIGINT, tag STRING)")
    spark.sql(s"""INSERT INTO graftmem.$table VALUES
      (10, 100, 'beta'), (20, NULL, 'alpha'), (30, 300, 'gamma')""")
    spark.sql(s"""INSERT INTO graftmem.$table VALUES
      (5, 50, 'delta'), (40, NULL, NULL)""")
  }

  test("COUNT/MIN/MAX are served from stats: no aggregate operator, exact values") {
    setupCatalog()
    createAndFill("st1")
    val q = spark.sql(
      """SELECT count(*) AS n, count(c) AS nc, min(k) AS mnk, max(k) AS mxk,
        |       min(tag) AS mnt, max(tag) AS mxt FROM graftmem.st1""".stripMargin)
    assert(pushed(q), s"expected complete pushdown:\n${q.queryExecution.executedPlan}")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4), r.getString(5)) == ((5L, 3L, 5L, 40L, "alpha", "gamma")))
  }

  test("time travel: VERSION AS OF serves the historical snapshot's stats") {
    setupCatalog()
    createAndFill("st2")
    val q = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM graftmem.st2 VERSION AS OF 1")
    assert(pushed(q))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 10L, 30L)))
  }

  test("declines: grouping, DISTINCT, SUM, and filters aggregate the plain scan") {
    setupCatalog()
    createAndFill("st3")
    val grouped = spark.sql(
      "SELECT tag, count(*) AS n FROM graftmem.st3 GROUP BY tag")
    assert(!pushed(grouped))
    assert(grouped.collect().length == 5)
    val distinct = spark.sql("SELECT count(DISTINCT c) AS n FROM graftmem.st3")
    assert(!pushed(distinct))
    assert(distinct.collect().head.getLong(0) == 3L)
    // SUM now serves from the exact per-commit sum sidecars
    val summed = spark.sql("SELECT sum(k) AS s FROM graftmem.st3")
    assert(pushed(summed), "integral SUM must serve from metadata")
    assert(summed.collect().head.getLong(0) == 105L)
    val avgd = spark.sql("SELECT avg(k) AS a FROM graftmem.st3")
    assert(pushed(avgd), "integral AVG must serve from metadata")
    assert(avgd.collect().head.getDouble(0) == 21.0)
    val filtered = spark.sql(
      "SELECT count(*) AS n FROM graftmem.st3 WHERE k > 15")
    assert(filtered.collect().head.getLong(0) == 3L)
  }

  test("floating-point min/max is untracked by design; COUNT still pushes") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.st4")
    spark.sql("CREATE TABLE graftmem.st4 (k BIGINT, x DOUBLE)")
    spark.sql("INSERT INTO graftmem.st4 VALUES (1, 1.5), (2, -2.5), (3, NULL)")
    val mn = spark.sql("SELECT min(x) AS m FROM graftmem.st4")
    assert(!pushed(mn), "double min/max must decline (NaN ordering)")
    assert(mn.collect().head.getDouble(0) == -2.5)
    val cnt = spark.sql("SELECT count(x) AS n, count(*) AS a FROM graftmem.st4")
    assert(pushed(cnt))
    assert((cnt.collect().head.getLong(0), cnt.collect().head.getLong(1)) ==
      ((2L, 3L)))
  }

  test("restart: stats fold back from the sidecars alone and still serve") {
    setupCatalog()
    createAndFill("st5")
    MemCatalog.simulateRestart()
    setupCatalog()
    val q = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(tag) AS mx FROM graftmem.st5")
    assert(pushed(q), "pushdown must survive a restart via sidecar replay")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getString(2)) ==
      ((5L, 5L, "gamma")))
    // historical version too
    val h = spark.sql(
      "SELECT count(*) AS n FROM graftmem.st5 VERSION AS OF 1")
    assert(pushed(h))
    assert(h.collect().head.getLong(0) == 3L)
  }

  test("lost sidecar degrades to a scan-backed aggregate with identical results") {
    setupCatalog()
    createAndFill("st6")
    // delete version 2's stats sidecar, then force a replay
    val dir = java.nio.file.Paths.get(MemCatalog.defaultRoot)
    val log = java.nio.file.Files.walk(dir).iterator()
    var removed = false
    while (log.hasNext) {
      val p = log.next()
      if (p.toString.contains("st6") &&
          p.getFileName.toString == "00000002.stats") {
        java.nio.file.Files.delete(p); removed = true
      }
    }
    assert(removed, "expected a stats sidecar for commit 2")
    MemCatalog.simulateRestart()
    setupCatalog()
    val q = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn FROM graftmem.st6")
    assert(!pushed(q), "missing sidecar must decline pushdown")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1)) == ((5L, 5L)))
    // version 1 predates the lost sidecar: still metadata-served
    val h = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn FROM graftmem.st6 VERSION AS OF 1")
    assert(pushed(h))
    val hr = h.collect().head
    assert((hr.getLong(0), hr.getLong(1)) == ((3L, 10L)))
  }

  test("schema evolution: a column added later reads NULL for old commits in stats") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.st7")
    spark.sql("CREATE TABLE graftmem.st7 (k BIGINT)")
    spark.sql("INSERT INTO graftmem.st7 VALUES (1), (2)")
    spark.sql("ALTER TABLE graftmem.st7 ADD COLUMN v BIGINT")
    spark.sql("INSERT INTO graftmem.st7 VALUES (3, 30), (4, NULL)")
    val q = spark.sql(
      "SELECT count(*) AS n, count(v) AS nv, min(v) AS mn, max(v) AS mx FROM graftmem.st7")
    assert(pushed(q))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 30L, 30L)))
  }

  test("MERGE (copy-on-write replace) re-seeds exact stats") {
    setupCatalog()
    createAndFill("st8")
    spark.sql(
      """MERGE INTO graftmem.st8 t
        |USING (SELECT 20 AS k) s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    val q = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM graftmem.st8")
    assert(pushed(q))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 5L, 40L)))
  }

  test("expiry consolidates stats for the oldest retained version") {
    setupCatalog()
    createAndFill("st9")
    spark.sql("INSERT INTO graftmem.st9 VALUES (50, 500, 'omega')")
    MemCatalog.expireSnapshots("graftmem", "st9", before = 2)
    val q = spark.sql(
      "SELECT count(*) AS n, max(k) AS mx FROM graftmem.st9 VERSION AS OF 2")
    assert(pushed(q))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1)) == ((5L, 40L)))
    MemCatalog.simulateRestart()
    setupCatalog()
    val q2 = spark.sql("SELECT count(*) AS n FROM graftmem.st9")
    assert(pushed(q2))
    assert(q2.collect().head.getLong(0) == 6L)
  }

  test("RESTORE commits history forward, keeps time travel, re-seeds stats") {
    setupCatalog()
    createAndFill("st11")
    MemCatalog.restoreSnapshot("graftmem", "st11", 1)
    // current state == version 1, served from the restore's own stats
    val cur = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM graftmem.st11")
    assert(pushed(cur))
    val r = cur.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 10L, 30L)))
    // superseded version 2 still readable (restore is forward-only)
    val v2 = spark.sql("SELECT count(*) AS n FROM graftmem.st11 VERSION AS OF 2")
    assert(pushed(v2) && v2.collect().head.getLong(0) == 5L)
    // and the whole arrangement survives a restart via the commit log
    MemCatalog.simulateRestart()
    setupCatalog()
    val after = spark.sql(
      "SELECT count(*) AS n, max(k) AS mx FROM graftmem.st11")
    assert(pushed(after))
    val ar = after.collect().head
    assert((ar.getLong(0), ar.getLong(1)) == ((3L, 30L)))
  }

  test("delta commits self-heal stats: extremal removal rescans, the rest folds") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.st12")
    spark.sql("CREATE TABLE graftmem.st12 (k BIGINT, c BIGINT)")
    spark.sql(
      "INSERT INTO graftmem.st12 VALUES (5, 50), (10, NULL), (20, 200), (40, 400)")
    def probe() = {
      val q = spark.sql(
        """SELECT count(*) AS n, count(c) AS nc, min(k) AS mn, max(k) AS mx
          |FROM graftmem.st12""".stripMargin)
      assert(pushed(q), "delta commit lost the stats-served path")
      val r = q.collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // delete the row holding min(k): the min must RESCAN-heal
    spark.sql("DELETE FROM graftmem.st12 WHERE k = 5")
    assert(probe() == ((3L, 2L, 10L, 40L)))
    // update the max row's key downward: max heals; null count adjusts
    spark.sql("UPDATE graftmem.st12 SET k = 15, c = NULL WHERE k = 40")
    assert(probe() == ((3L, 1L, 10L, 20L)))
    // a MERGE inserting a new extreme folds in without a rescan
    spark.sql(
      """MERGE INTO graftmem.st12 t
        |USING (SELECT 99 AS k, 990 AS c) s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, c) VALUES (s.k, s.c)""".stripMargin)
    assert(probe() == ((4L, 2L, 10L, 99L)))
    // the healed stats ride the sidecars across a restart
    MemCatalog.simulateRestart()
    setupCatalog()
    assert(probe() == ((4L, 2L, 10L, 99L)))
  }

  test("empty table serves count 0 and NULL min/max from metadata") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.st10")
    spark.sql("CREATE TABLE graftmem.st10 (k BIGINT)")
    val q = spark.sql("SELECT count(*) AS n, min(k) AS mn FROM graftmem.st10")
    assert(pushed(q))
    val r = q.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }
}
