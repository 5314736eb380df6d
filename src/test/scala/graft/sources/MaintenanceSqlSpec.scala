package graft.sources

import graft.SparkTestBase

/** The SQL maintenance surface (GraftSqlParser, injected via
  * `spark.sql.extensions=graft.GraftExtensions`):
  *
  *  1. OPTIMIZE ... TARGET n ROWS ZORDER/HILBERT BY compacts through
  *     the parser with identical content and a dataChange=false
  *     version;
  *  2. VACUUM ... RETAIN n VERSIONS expires history (reads of expired
  *     versions fail loudly, content preserved); idempotent when
  *     already within the window;
  *  3. RESTORE TABLE ... VERSION AS OF commits the historical state
  *     FORWARD;
  *  4. malformed verbs fail loudly at parse time with the grammar;
  *     unknown tables fail in analysis; everything else delegates to
  *     Spark's parser untouched.
  */
class MaintenanceSqlSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_msql").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftms", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftms.path", root)
  }

  test("OPTIMIZE ... ZORDER BY via SQL: content identical, files compacted") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.t1")
    spark.sql("CREATE TABLE graftms.t1 (a BIGINT, b BIGINT)")
    (0 until 6).foreach(i => spark.sql(
      s"INSERT INTO graftms.t1 SELECT id, id * 2 FROM RANGE(${i * 100}, ${i * 100 + 100})"))
    val before = spark.table("graftms.t1").orderBy("a").collect()
    val filesBefore = spark.sql("SELECT count(*) FROM graftms.t1.files")
      .head().getLong(0)
    val out = spark.sql(
      "OPTIMIZE graftms.t1 TARGET 300 ROWS ZORDER BY (a, b)").collect()
    assert(out.length == 1 && out(0).getString(0) == "graftms.t1" &&
      out(0).getString(1).contains("zorder"), out.mkString)
    assert(spark.table("graftms.t1").orderBy("a").collect()
      .sameElements(before), "OPTIMIZE changed content")
    val filesAfter = spark.sql("SELECT count(*) FROM graftms.t1.files")
      .head().getLong(0)
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    // dataChange = false: the change feed shows nothing for it
    val v = spark.sql("SELECT max(version) FROM graftms.t1.history")
      .head().getLong(0).toInt
    assert(MemCatalog.tableChanges(spark, "graftms", "t1", v, v).count() == 0L)
  }

  test("VACUUM ... RETAIN via SQL: history pruned, content kept, idempotent") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.t2")
    spark.sql("CREATE TABLE graftms.t2 (k BIGINT)")
    spark.sql("INSERT INTO graftms.t2 SELECT id FROM RANGE(10)")
    spark.sql("INSERT INTO graftms.t2 SELECT id FROM RANGE(10, 20)")
    spark.sql("INSERT INTO graftms.t2 SELECT id FROM RANGE(20, 30)")
    val out = spark.sql("VACUUM graftms.t2 RETAIN 2 VERSIONS").collect()
    assert(out(0).getString(1).contains("expired versions below 2"),
      out.mkString)
    assert(spark.table("graftms.t2").count() == 30L)
    val oldest = spark.sql("SELECT min(version) FROM graftms.t2.history")
      .head().getLong(0)
    assert(oldest == 2L, s"oldest retained = $oldest")
    intercept[Exception] {
      spark.sql("SELECT * FROM graftms.t2 VERSION AS OF 1").collect()
    }
    // idempotent: already within the window
    val again = spark.sql("VACUUM graftms.t2 RETAIN 2 VERSIONS").collect()
    assert(again(0).getString(1).contains("nothing to expire"),
      again.mkString)
  }

  test("RESTORE TABLE ... VERSION AS OF via SQL commits forward") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.t3")
    spark.sql("CREATE TABLE graftms.t3 (k BIGINT)")
    spark.sql("INSERT INTO graftms.t3 SELECT id FROM RANGE(5)") // v1
    spark.sql("INSERT INTO graftms.t3 SELECT id FROM RANGE(5, 9)") // v2
    spark.sql("RESTORE TABLE graftms.t3 VERSION AS OF 1") // v3
    assert(spark.table("graftms.t3").count() == 5L)
    // forward commit: v2 still time-travelable
    assert(spark.sql("SELECT count(*) FROM graftms.t3 VERSION AS OF 2")
      .head().getLong(0) == 9L)
    // RESTORE without the TABLE keyword also parses
    spark.sql("RESTORE graftms.t3 VERSION AS OF 2")
    assert(spark.table("graftms.t3").count() == 9L)
  }

  test("malformed verbs fail loudly; other SQL delegates untouched") {
    setup()
    val e1 = intercept[GraftSqlParseException] {
      spark.sql("OPTIMIZE graftms.t1 SORT BY (a)")
    }
    assert(e1.getMessage.contains("OPTIMIZE cat.tbl"), e1.getMessage)
    intercept[GraftSqlParseException] {
      spark.sql("VACUUM graftms.t2 RETAIN x VERSIONS")
    }
    intercept[GraftSqlParseException] {
      spark.sql("RESTORE TABLE graftms.t3") // missing VERSION AS OF
    }
    // ZORDER BY with an empty column list is a parse error
    intercept[GraftSqlParseException] {
      spark.sql("OPTIMIZE graftms.t1 ZORDER BY ()")
    }
    // unknown table fails in ANALYSIS (catalog resolution), not parse
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("OPTIMIZE graftms.nope TARGET 10 ROWS").collect()
    }
    // the delegate path: ordinary SQL (even containing the words) is
    // untouched
    assert(spark.sql("SELECT 'VACUUM graftms.t2' AS s").head().getString(0)
      == "VACUUM graftms.t2")
    assert(spark.sql("SELECT 1 AS optimize").head().getInt(0) == 1)
  }
}
