package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** PARTITION OVERWRITE (`INSERT OVERWRITE ... PARTITION` static mode
  * and dynamic partitionOverwriteMode) as ONE atomic kind-6 commit:
  *  1. static: exactly the filtered partition's files are replaced;
  *     other partitions keep their FILES (no rewrite) and overlays;
  *  2. dynamic: exactly the partitions the new data touches are
  *     replaced;
  *  3. the change feed shows the overwrite as deletes + inserts in
  *     one version; time travel serves the pre-overwrite state;
  *  4. stats stay exact (count/min/max pushdown correct after an
  *     overwrite beside an UPDATE-overlaid kept partition);
  *  5. restart replay and expiry across the overwrite work.
  */
class CatalogOverwriteSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_ow").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftow", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftow.path", root)
  }

  test("static INSERT OVERWRITE PARTITION replaces exactly the filtered partition") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftow.t1")
    spark.sql(
      """CREATE TABLE graftow.t1 (grp STRING, v BIGINT)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      """INSERT INTO graftow.t1
        |SELECT CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id
        |FROM RANGE(100)""".stripMargin) // v1
    // overlay on the KEPT partition: must survive the overwrite
    spark.sql("UPDATE graftow.t1 SET v = 9999 WHERE grp = 'a' AND v = 2") // v2
    val keptFiles = spark.sql(
      "SELECT file FROM graftow.t1.files WHERE partition = 'grp=a'")
      .collect().map(_.getString(0)).toSet

    spark.sql(
      """INSERT OVERWRITE graftow.t1 PARTITION (grp = 'b')
        |SELECT 1000 + id FROM RANGE(3)""".stripMargin) // v3

    val a = spark.sql("SELECT v FROM graftow.t1 WHERE grp = 'a'")
      .collect().map(_.getLong(0)).sorted
    assert(a.length == 50 && a.contains(9999L) && !a.contains(2L),
      "kept partition must keep its rows AND its UPDATE overlay")
    val b = spark.sql("SELECT v FROM graftow.t1 WHERE grp = 'b'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(b == Seq(1000L, 1001L, 1002L), s"overwritten partition: $b")
    // kept partition's files are untouched (no rewrite)
    val nowA = spark.sql(
      "SELECT file FROM graftow.t1.files WHERE partition = 'grp=a'")
      .collect().map(_.getString(0)).toSet
    assert(nowA == keptFiles, "overwrite must not rewrite kept files")

    // ONE atomic version; CDF shows 50 deletes + 3 inserts for it
    val v = spark.sql("SELECT max(version) FROM graftow.t1.history")
      .head().getLong(0).toInt
    val cdf = MemCatalog.tableChanges(spark, "graftow", "t1", v, v)
    assert(cdf.where(col("_change_type") === "delete").count() == 50L)
    assert(cdf.where(col("_change_type") === "insert").count() == 3L)
    // time travel serves the pre-overwrite partition
    assert(spark.sql(
      s"SELECT count(*) FROM graftow.t1 VERSION AS OF ${v - 1} " +
        "WHERE grp = 'b'").head().getLong(0) == 50L)

    // exact stats after the overwrite: count pushdown agrees with a scan
    assert(spark.sql("SELECT count(*) AS n FROM graftow.t1")
      .head().getLong(0) == 53L)
  }

  test("dynamic partitionOverwriteMode replaces exactly the touched partitions") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftow.t2")
    spark.sql(
      """CREATE TABLE graftow.t2 (grp STRING, v BIGINT)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      """INSERT INTO graftow.t2
        |SELECT concat('g', id % 4), id FROM RANGE(400)""".stripMargin)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(
        """INSERT OVERWRITE graftow.t2
          |SELECT concat('g', id % 2), 10000 + id FROM RANGE(20)""".stripMargin)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // g0/g1 replaced (10 rows each), g2/g3 untouched (100 rows each)
    val byGrp = spark.sql(
      "SELECT grp, count(*) AS n, min(v) AS mn FROM graftow.t2 GROUP BY grp")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byGrp("g0") == ((10L, 10000L)) && byGrp("g1") == ((10L, 10001L)),
      s"touched partitions must be replaced: $byGrp")
    assert(byGrp("g2") == ((100L, 2L)) && byGrp("g3") == ((100L, 3L)),
      s"untouched partitions must survive: $byGrp")
  }

  test("overwrite survives restart replay and expiry; conflicts abort") {
    setup()
    val before = spark.table("graftow.t1").orderBy("grp", "v").collect()
    MemCatalog.simulateRestart()
    assert(spark.table("graftow.t1").orderBy("grp", "v").collect()
      .sameElements(before), "restart replay changed the overwrite")
    val v = spark.sql("SELECT max(version) FROM graftow.t1.history")
      .head().getLong(0).toInt
    MemCatalog.expireSnapshots("graftow", "t1", before = v)
    assert(spark.table("graftow.t1").orderBy("grp", "v").collect()
      .sameElements(before), "expiry across the overwrite changed content")
    MemCatalog.simulateRestart()
    assert(spark.table("graftow.t1").orderBy("grp", "v").collect()
      .sameElements(before), "post-expiry replay changed content")

  }
}
