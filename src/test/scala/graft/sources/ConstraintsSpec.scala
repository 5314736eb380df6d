package graft.sources

import graft.SparkTestBase

/** WRITE-TIME CONSTRAINTS (Delta invariants):
  *
  *  1. a violating INSERT aborts ATOMICALLY: zero new versions, no
  *     live-file change, staged files deleted by the write abort;
  *  2. NOT NULL enforces on inserts AND survives RENAME COLUMN
  *     (field-id keyed); MERGE/UPDATE rows enforce CHECKs too;
  *  3. adding a constraint validates EXISTING rows (refused when a
  *     stored row already violates);
  *  4. constraints survive restart; DROP CONSTRAINT lifts the gate;
  *  5. renaming/dropping a CHECK-referenced column is refused;
  *  6. valid writes are unaffected throughout.
  */
class ConstraintsSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_ck").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftcons", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcons.path", root)
  }

  private def version(t: String): Long =
    spark.sql(s"SELECT max(version) FROM graftcons.$t.history")
      .head().getLong(0)

  test("violating INSERT aborts atomically: no version, no rows, no files") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcons.t1")
    spark.sql("CREATE TABLE graftcons.t1 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcons.t1 SELECT id, id * 2 FROM RANGE(10)")
    spark.sql(
      "ALTER TABLE graftcons.t1 ADD CONSTRAINT v_even CHECK (v % 2 = 0)")
    val v0 = version("t1")
    val files0 = spark.sql("SELECT file FROM graftcons.t1.files")
      .collect().map(_.getString(0)).toSet
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graftcons.t1 VALUES (100, 7)")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ConstraintViolationException]),
      e.toString)
    assert(version("t1") == v0, "violating INSERT must commit no version")
    assert(spark.table("graftcons.t1").count() == 10L)
    assert(spark.sql("SELECT file FROM graftcons.t1.files")
      .collect().map(_.getString(0)).toSet == files0)
    // no stray files beyond the live set + log machinery
    val dataDir = java.nio.file.Paths.get(root, "t1", "data")
    val onDisk = java.nio.file.Files.list(dataDir).iterator()
    var stray = 0
    while (onDisk.hasNext) {
      val f = onDisk.next().getFileName.toString
      if (!files0.contains(f)) stray += 1
    }
    assert(stray == 0, s"$stray stray data files after aborted INSERT")
    // valid writes unaffected
    spark.sql("INSERT INTO graftcons.t1 VALUES (100, 8)")
    assert(spark.table("graftcons.t1").count() == 11L)
  }

  test("NOT NULL enforces and survives RENAME COLUMN (field-id keyed)") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcons.t2")
    spark.sql("CREATE TABLE graftcons.t2 (k BIGINT, tag STRING)")
    spark.sql("INSERT INTO graftcons.t2 VALUES (1, 'a')")
    spark.sql("ALTER TABLE graftcons.t2 ALTER COLUMN tag SET NOT NULL")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcons.t2 VALUES (2, NULL)")
    }
    assert(spark.table("graftcons.t2").count() == 1L)
    spark.sql("ALTER TABLE graftcons.t2 RENAME COLUMN tag TO label")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcons.t2 VALUES (3, NULL)")
    }
    spark.sql("INSERT INTO graftcons.t2 VALUES (4, 'b')")
    assert(spark.table("graftcons.t2").count() == 2L)
    // DROP NOT NULL lifts it (by the renamed name)
    spark.sql("ALTER TABLE graftcons.t2 ALTER COLUMN label DROP NOT NULL")
    spark.sql("INSERT INTO graftcons.t2 VALUES (5, NULL)")
    assert(spark.table("graftcons.t2").count() == 3L)
  }

  test("MERGE/UPDATE rows enforce CHECK constraints") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcons.t3")
    spark.sql("CREATE TABLE graftcons.t3 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftcons.t3 SELECT id, 10 + id FROM RANGE(5)")
    spark.sql(
      "ALTER TABLE graftcons.t3 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    intercept[Exception] {
      spark.sql("UPDATE graftcons.t3 SET v = -1 WHERE k = 2")
    }
    assert(spark.sql("SELECT v FROM graftcons.t3 WHERE k = 2")
      .head().getLong(0) == 12L, "aborted UPDATE must not land")
    intercept[Exception] {
      spark.sql(
        """MERGE INTO graftcons.t3 t USING (SELECT 99 AS k, -5 AS v) s
          |ON t.k = s.k WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(spark.table("graftcons.t3").count() == 5L)
    spark.sql("UPDATE graftcons.t3 SET v = 0 WHERE k = 2") // valid
    assert(spark.sql("SELECT v FROM graftcons.t3 WHERE k = 2")
      .head().getLong(0) == 0L)
  }

  test("adding a constraint validates existing rows; survives restart") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcons.t4")
    spark.sql("CREATE TABLE graftcons.t4 (k BIGINT)")
    spark.sql("INSERT INTO graftcons.t4 VALUES (1), (2), (-3)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graftcons.t4 ADD CONSTRAINT k_pos CHECK (k > 0)")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ConstraintViolationException]),
      e.toString)
    // rejected: inserts still unconstrained
    spark.sql("INSERT INTO graftcons.t4 VALUES (-4)")
    spark.sql("DELETE FROM graftcons.t4 WHERE k < 0")
    spark.sql("ALTER TABLE graftcons.t4 ADD CONSTRAINT k_pos CHECK (k > 0)")
    // restart: the constraint replays from the sidecar
    MemCatalog.simulateRestart()
    intercept[Exception] {
      spark.sql("INSERT INTO graftcons.t4 VALUES (-9)")
    }
    assert(spark.table("graftcons.t4").count() == 2L)
    spark.sql("ALTER TABLE graftcons.t4 DROP CONSTRAINT k_pos")
    spark.sql("INSERT INTO graftcons.t4 VALUES (-9)") // gate lifted
    assert(spark.table("graftcons.t4").count() == 3L)
  }

  test("rename/drop of a CHECK-referenced column is refused") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcons.t5")
    spark.sql("CREATE TABLE graftcons.t5 (a BIGINT, b BIGINT)")
    spark.sql(
      "ALTER TABLE graftcons.t5 ADD CONSTRAINT ab CHECK (a + b > 0 OR a IS NULL)")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graftcons.t5 RENAME COLUMN a TO a2")
    }
    assert(e1.getMessage.contains("CHECK"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graftcons.t5 DROP COLUMN b")
    }
    assert(e2.getMessage.contains("CHECK"), e2.getMessage)
    spark.sql("ALTER TABLE graftcons.t5 DROP CONSTRAINT ab")
    spark.sql("ALTER TABLE graftcons.t5 RENAME COLUMN a TO a2") // now fine
    assert(spark.table("graftcons.t5").columns.toSeq == Seq("a2", "b"))
    // NULL passes a CHECK (ANSI): re-add over the renamed layout
    spark.sql(
      "ALTER TABLE graftcons.t5 ADD CONSTRAINT pos CHECK (a2 > 0)")
    spark.sql("INSERT INTO graftcons.t5 VALUES (NULL, 1)") // NULL passes
    assert(spark.table("graftcons.t5").count() == 1L)
  }
}
