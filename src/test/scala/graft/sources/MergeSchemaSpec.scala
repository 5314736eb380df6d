package graft.sources

import graft.SparkTestBase

/** `mergeSchema` — automatic schema evolution on BY-NAME appends
  * ([[MergeSchemaRule]], the Delta model as an analyzer rule): extra
  * frame columns evolve the table (metadata-only ADD COLUMN, field-id
  * assigned), missing frame columns fill NULL, and WITHOUT the opt-in
  * Spark's own by-name resolution rejects the mismatch exactly as
  * before. Positional INSERT is untouched. */
class MergeSchemaSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_merge").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftms", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftms.path", root)
  }

  test("extra frame columns evolve the table; old rows read NULL; " +
      "survives restart") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.m1")
    spark.sql("CREATE TABLE graftms.m1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftms.m1 VALUES (1, 'a')")
    spark.range(1).selectExpr("2L AS k", "'b' AS v", "99L AS extra")
      .writeTo("graftms.m1").option("mergeSchema", "true").append()
    val rows = spark.sql(
      "SELECT k, v, extra FROM graftms.m1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", -1L), (2L, "b", 99L)), rows)
    MemCatalog.simulateRestart()
    assert(spark.table("graftms.m1").schema.fieldNames.toSeq ==
      Seq("k", "v", "extra"))
  }

  test("missing frame columns fill NULL under the opt-in; column " +
      "order is free") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.m2")
    spark.sql("CREATE TABLE graftms.m2 (k BIGINT, v STRING, w BIGINT)")
    // frame carries (v, k) only, reordered — w fills NULL
    spark.range(1).selectExpr("'x' AS v", "7L AS k")
      .writeTo("graftms.m2").option("mergeSchema", "true").append()
    val r = spark.sql("SELECT k, v, w FROM graftms.m2").head()
    assert(r.getLong(0) == 7L && r.getString(1) == "x" && r.isNullAt(2), r)
  }

  test("session conf covers SQL INSERT BY NAME; off = Spark's own " +
      "loud mismatch") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.m3")
    spark.sql("CREATE TABLE graftms.m3 (k BIGINT)")
    withConf("spark.graft.schema.autoMerge.enabled" -> "true") {
      spark.sql("INSERT INTO graftms.m3 BY NAME " +
        "SELECT 1L AS k, 'new' AS tag")
    }
    assert(spark.table("graftms.m3").schema.fieldNames.toSeq ==
      Seq("k", "tag"))
    // opt-in absent: the mismatch fails in Spark's own resolution
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graftms.m3 BY NAME " +
        "SELECT 2L AS k, 'x' AS tag, 3L AS another")
    }
    assert(e.getMessage != null, e)
    assert(spark.table("graftms.m3").schema.length == 2,
      "no evolution without the opt-in")
  }

  test("types still validate: an incompatible extra write fails, " +
      "positional INSERT untouched") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftms.m4")
    spark.sql("CREATE TABLE graftms.m4 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftms.m4 VALUES (1, 'a')") // positional: fine
    // existing column with an incompatible type: Spark's output
    // resolution still rejects (the rule only aligns names)
    val e = intercept[Exception] {
      spark.range(1)
        .selectExpr("named_struct('a', 1) AS k", "'b' AS v")
        .writeTo("graftms.m4").option("mergeSchema", "true").append()
    }
    assert(e.getMessage != null, e)
    assert(spark.sql("SELECT count(*) FROM graftms.m4")
      .head().getLong(0) == 1L)
  }
}
