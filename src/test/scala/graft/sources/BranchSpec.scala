package graft.sources

import graft.SparkTestBase

/** Named writable branches ([[Branches]]):
  *
  *  1. CREATE BRANCH forks zero-copy; the branch is a full read-WRITE
  *     table at `cat.t.branch_<name>`; writes stay invisible on main;
  *     `VERSION AS OF 'name'` reads the branch head from the base.
  *  2. MERGE BRANCH publishes the audited suffix atomically; refused
  *     when main moved since the fork.
  *  3. DROP BRANCH unlinks; the base is untouched.
  *  4. Link ownership: a branch SURVIVES OPTIMIZE + VACUUM on the
  *     base (retention cannot break a branch).
  *  5. Tags shadow branches in VERSION AS OF; branch handles are not
  *     listed as tables; loud errors for unknown/malformed.
  */
class BranchSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_branch").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gbr", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbr.path", root)
  }

  test("create, write-to-branch isolation, VERSION AS OF reads, merge") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gbr.t")
    spark.sql("CREATE TABLE gbr.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gbr.t VALUES (1, 'main')")
    val msg = spark.sql("ALTER TABLE gbr.t CREATE BRANCH dev")
      .head().getString(1)
    assert(msg.contains("branch 'dev'"), msg)
    // audit writes land on the branch handle only
    spark.sql("INSERT INTO gbr.t.branch_dev VALUES (2, 'audited')")
    spark.sql("UPDATE gbr.t.branch_dev SET v = 'fixed' WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gbr.t").head().getLong(0) == 1L,
      "branch writes must stay invisible on main")
    assert(spark.sql("SELECT v FROM gbr.t WHERE k = 1").head()
      .getString(0) == "main")
    // branch reads: the handle AND VERSION AS OF 'dev' on the base
    assert(spark.sql("SELECT count(*) FROM gbr.t.branch_dev")
      .head().getLong(0) == 2L)
    val asOf = spark.sql(
      "SELECT k, v FROM gbr.t VERSION AS OF 'dev' ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(asOf == Seq((1L, "fixed"), (2L, "audited")), asOf)
    // publish
    val m2 = spark.sql("ALTER TABLE gbr.t MERGE BRANCH dev")
      .head().getString(1)
    assert(m2.contains("merged branch 'dev'"), m2)
    val main = spark.sql("SELECT k, v FROM gbr.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(main == Seq((1L, "fixed"), (2L, "audited")), main)
    // durable across restart
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM gbr.t").head().getLong(0) == 2L)
    spark.sql("ALTER TABLE gbr.t DROP BRANCH dev").collect()
    intercept[Exception] {
      spark.sql("SELECT * FROM gbr.t.branch_dev").collect()
    }
  }

  test("merge refused when main moved; re-branch is the rebase") {
    setup()
    spark.sql("ALTER TABLE gbr.t CREATE BRANCH wap").collect()
    spark.sql("INSERT INTO gbr.t.branch_wap VALUES (10, 'w')")
    spark.sql("INSERT INTO gbr.t VALUES (99, 'race')") // main moves
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gbr.t MERGE BRANCH wap").collect()
    }
    assert((e.getMessage + String.valueOf(e.getCause))
      .contains("the target moved"), e.getMessage)
    spark.sql("ALTER TABLE gbr.t DROP BRANCH wap").collect()
  }

  test("a branch survives OPTIMIZE + VACUUM on the base (link ownership)") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gbr.s")
    spark.sql("CREATE TABLE gbr.s (k BIGINT)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO gbr.s SELECT /*+ REPARTITION(1) */ id + " +
        s"${i * 1000} FROM RANGE(50)"))
    spark.sql("ALTER TABLE gbr.s CREATE BRANCH keep").collect()
    val sumB = spark.sql("SELECT sum(k) FROM gbr.s.branch_keep")
      .head().getLong(0)
    // base compacts and expires history; its old files vacuum away
    spark.sql("OPTIMIZE gbr.s TARGET 1000 ROWS").collect()
    spark.sql("INSERT INTO gbr.s VALUES (7)")
    spark.sql("VACUUM gbr.s RETAIN 1 VERSIONS").collect()
    // the branch still reads its forked state — even from a cold load
    MemCatalog.invalidateBranch("gbr", "s", "keep")
    assert(spark.sql("SELECT sum(k) FROM gbr.s.branch_keep")
      .head().getLong(0) == sumB,
      "branch must survive base OPTIMIZE + VACUUM")
    spark.sql("ALTER TABLE gbr.s DROP BRANCH keep").collect()
  }

  test("tags shadow branches in VERSION AS OF; loud errors") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gbr.x")
    spark.sql("CREATE TABLE gbr.x (k BIGINT)")
    spark.sql("INSERT INTO gbr.x VALUES (1)")        // v1
    spark.sql("ALTER TABLE gbr.x CREATE TAG pin VERSION AS OF 1")
    spark.sql("ALTER TABLE gbr.x CREATE BRANCH pin").collect()
    spark.sql("INSERT INTO gbr.x.branch_pin VALUES (2)")
    // 'pin' resolves as the TAG (v1 = one row), not the branch (2)
    assert(spark.sql("SELECT count(*) FROM gbr.x VERSION AS OF 'pin'")
      .head().getLong(0) == 1L)
    spark.sql("ALTER TABLE gbr.x DROP BRANCH pin").collect()
    val unknown = intercept[Exception] {
      spark.sql("SELECT * FROM gbr.x VERSION AS OF 'nosuch'").collect()
    }
    assert(unknown != null)
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE gbr.x CREATE BRANCH b1").collect()
      spark.sql("ALTER TABLE gbr.x CREATE BRANCH b1").collect()
    }
    assert(String.valueOf(dup.getMessage).contains("already exists"),
      dup.getMessage)
    val mal = intercept[Exception] {
      spark.sql("ALTER TABLE gbr.x CREATE BRANCH").collect()
    }
    assert(String.valueOf(mal.getMessage).contains("branch"), mal.getMessage)
    spark.sql("ALTER TABLE gbr.x DROP BRANCH b1").collect()
    // branch handles never appear in SHOW TABLES
    val listed = spark.sql("SHOW TABLES IN gbr").collect()
      .map(_.getString(1)).toSet
    assert(!listed.exists(_.startsWith("branch_")), listed.toString)
  }

  test("branches follow the table lifecycle: DROP buries them with " +
      "the incarnation, UNDROP restores, RENAME re-points provenance") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gbr.lc PURGE")
    spark.sql("DROP TABLE IF EXISTS gbr.lc2 PURGE")
    spark.sql("CREATE TABLE gbr.lc (k BIGINT)")
    spark.sql("INSERT INTO gbr.lc VALUES (1)")
    spark.sql("ALTER TABLE gbr.lc CREATE BRANCH dev").collect()
    spark.sql("INSERT INTO gbr.lc.branch_dev VALUES (2)")
    // DROP: a recreated table must NOT inherit the dropped fork
    spark.sql("DROP TABLE gbr.lc")
    spark.sql("CREATE TABLE gbr.lc (k BIGINT)")
    intercept[Exception] {
      spark.sql("SELECT * FROM gbr.lc.branch_dev").collect()
    }
    spark.sql("DROP TABLE gbr.lc PURGE")
    // UNDROP: the original incarnation returns WITH its branch
    spark.sql("UNDROP TABLE gbr.lc").collect()
    assert(spark.sql("SELECT count(*) FROM gbr.lc.branch_dev")
      .head().getLong(0) == 2L, "undrop must restore the branch")
    // RENAME: branch travels and MERGE still validates provenance
    spark.sql("ALTER TABLE gbr.lc RENAME TO lc2")
    assert(spark.sql("SELECT count(*) FROM gbr.lc2.branch_dev")
      .head().getLong(0) == 2L)
    spark.sql("ALTER TABLE gbr.lc2 MERGE BRANCH dev").collect()
    assert(spark.sql("SELECT count(*) FROM gbr.lc2").head().getLong(0)
      == 2L)
    spark.sql("ALTER TABLE gbr.lc2 DROP BRANCH dev").collect()
    spark.sql("DROP TABLE gbr.lc2 PURGE")
  }

  test("time travel ON a branch handle resolves within its history") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gbr.tt")
    spark.sql("CREATE TABLE gbr.tt (k BIGINT)")
    spark.sql("INSERT INTO gbr.tt VALUES (1)") // v1
    spark.sql("ALTER TABLE gbr.tt CREATE BRANCH b").collect()
    spark.sql("INSERT INTO gbr.tt.branch_b VALUES (2)") // branch v2
    spark.sql("INSERT INTO gbr.tt.branch_b VALUES (3)") // branch v3
    assert(spark.sql(
      "SELECT count(*) FROM gbr.tt.branch_b VERSION AS OF 2")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM gbr.tt.branch_b")
      .head().getLong(0) == 3L)
    spark.sql("ALTER TABLE gbr.tt DROP BRANCH b").collect()
  }
}
