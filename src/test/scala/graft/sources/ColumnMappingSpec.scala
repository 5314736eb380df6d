package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Field-id COLUMN MAPPING: `ALTER TABLE RENAME/DROP COLUMN` as
  * metadata-only commits (the Delta column-mapping / Iceberg model):
  *
  *  1. data files written BEFORE a rename serve the renamed column by
  *     FIELD ID — no rewrite, old and new file generations read
  *     together;
  *  2. time travel to a pre-rename version shows the pre-rename
  *     schema and its data;
  *  3. DROP hides the column (reads project, writes take the narrower
  *     row), its values stay out even after ADD COLUMN reuses the
  *     name, and history before the drop still shows it;
  *  4. restart replay and snapshot expiry across the changes work;
  *  5. tables created before mapping (no field ids) refuse loudly.
  */
class ColumnMappingSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_cm").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftcm", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcm.path", root)
  }

  test("RENAME COLUMN: old and new file generations read together by field id") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcm.t1")
    spark.sql("CREATE TABLE graftcm.t1 (k BIGINT, val STRING)")
    spark.sql("INSERT INTO graftcm.t1 VALUES (1, 'one'), (2, 'two')") // v1: files name the column 'val'
    spark.sql("ALTER TABLE graftcm.t1 RENAME COLUMN val TO label")    // v2: metadata only
    spark.sql("INSERT INTO graftcm.t1 VALUES (3, 'three')")           // v3: files name it 'label'

    assert(spark.table("graftcm.t1").schema.fieldNames.toSeq ==
      Seq("k", "label"))
    val got = spark.sql(
      "SELECT k, label FROM graftcm.t1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "one"), (2L, "two"), (3L, "three")),
      s"pre-rename files must serve the renamed column: $got")
    // filters on the new name reach pre-rename files too
    assert(spark.sql("SELECT k FROM graftcm.t1 WHERE label = 'two'")
      .head().getLong(0) == 2L)
    // no data file was rewritten by the rename: v1's files still live
    val entries = CommitLog.open(java.nio.file.Paths.get(root, "t1")).replay()
    val v1files = entries.find(_.version == 1).get
      .asInstanceOf[FileCommit].files.map(_.name).toSet
    val live = spark.sql("SELECT file FROM graftcm.t1.files")
      .collect().map(_.getString(0)).toSet
    assert(v1files.subsetOf(live), "rename must not rewrite data files")
  }

  test("time travel shows the pre-rename schema and data") {
    setup()
    val pre = spark.sql("SELECT * FROM graftcm.t1 VERSION AS OF 1")
    assert(pre.schema.fieldNames.toSeq == Seq("k", "val"),
      s"version 1 must surface the OLD name: ${pre.schema.fieldNames.toSeq}")
    val got = pre.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "one"), (2L, "two")))
  }

  test("DROP COLUMN hides data without rewrite; ADD may reuse the name") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcm.t2")
    spark.sql("CREATE TABLE graftcm.t2 (k BIGINT, secret STRING, keep BIGINT)")
    spark.sql(
      "INSERT INTO graftcm.t2 VALUES (1, 's1', 10), (2, 's2', 20)") // v1
    spark.sql("ALTER TABLE graftcm.t2 DROP COLUMN secret")          // v2
    assert(spark.table("graftcm.t2").schema.fieldNames.toSeq ==
      Seq("k", "keep"))
    // writes take the narrower row
    spark.sql("INSERT INTO graftcm.t2 VALUES (3, 30)")              // v3
    val got = spark.sql("SELECT k, keep FROM graftcm.t2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // history BEFORE the drop still shows the column
    val v1 = spark.sql("SELECT * FROM graftcm.t2 VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq == Seq("k", "secret", "keep"))
    assert(v1.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("s1", "s2"))
    // a NEW column may reuse the name: it is a NEW field id, so the
    // dropped values never resurface
    spark.sql("ALTER TABLE graftcm.t2 ADD COLUMN secret STRING")    // v4
    val re = spark.sql("SELECT k, secret FROM graftcm.t2 ORDER BY k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(re == Seq((1L, null), (2L, null), (3L, null)),
      s"dropped values must not resurface under a reused name: $re")
    // row-level DML keeps working at the evolved logical shape
    spark.sql("UPDATE graftcm.t2 SET secret = 'new3' WHERE k = 3")  // v5
    assert(spark.sql("SELECT secret FROM graftcm.t2 WHERE k = 3")
      .head().getString(0) == "new3")
  }

  test("restart replay and snapshot expiry across rename + drop") {
    setup()
    val before1 = spark.table("graftcm.t1").orderBy("k").collect().toSeq
    val before2 = spark.table("graftcm.t2").orderBy("k").collect().toSeq
    MemCatalog.simulateRestart()
    assert(spark.table("graftcm.t1").orderBy("k").collect().toSeq == before1)
    assert(spark.table("graftcm.t2").orderBy("k").collect().toSeq == before2)
    assert(spark.table("graftcm.t1").schema.fieldNames.toSeq ==
      Seq("k", "label"))
    // expiry ACROSS the rename: consolidate past v2, content identical
    MemCatalog.expireSnapshots("graftcm", "t1", before = 3)
    assert(spark.table("graftcm.t1").orderBy("k").collect().toSeq == before1)
    MemCatalog.simulateRestart()
    assert(spark.table("graftcm.t1").orderBy("k").collect().toSeq == before1,
      "post-expiry restart replay changed content")
  }

  test("pre-mapping tables (no field ids) refuse RENAME/DROP loudly") {
    setup()
    // simulate a legacy table: a log created with a RAW (id-less)
    // schema, resumed by the catalog
    val legacy = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val dir = java.nio.file.Paths.get(root, "legacy")
    if (!CommitLog.existsAt(dir))
      CommitLog.create(dir, legacy, MemStore.nowMicros())
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graftcm.legacy RENAME COLUMN v TO w")
    }
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("ALTER TABLE RENAME TO moves the durable table wholesale") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftcm.rt1")
    spark.sql("DROP TABLE IF EXISTS graftcm.rt2")
    spark.sql("CREATE TABLE graftcm.rt1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftcm.rt1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE graftcm.rt1 SET v = 'B' WHERE k = 2")
    val before = spark.table("graftcm.rt1").orderBy("k").collect().toSeq

    spark.sql("ALTER TABLE graftcm.rt1 RENAME TO rt2")
    assert(spark.table("graftcm.rt2").orderBy("k").collect().toSeq == before,
      "rename changed content")
    // history and time travel travel with the table
    assert(spark.sql("SELECT count(*) FROM graftcm.rt2 VERSION AS OF 1")
      .head().getLong(0) == 2L)
    intercept[Exception](spark.table("graftcm.rt1").collect())
    // durable across restart under the NEW name
    MemCatalog.simulateRestart()
    assert(spark.table("graftcm.rt2").orderBy("k").collect().toSeq == before)
    // renaming onto an existing table refuses
    spark.sql("CREATE TABLE graftcm.rt3 (x BIGINT)")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graftcm.rt2 RENAME TO rt3"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }
}
