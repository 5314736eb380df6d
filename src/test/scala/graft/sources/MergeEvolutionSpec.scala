package graft.sources

import graft.SparkTestBase

/** MERGE schema evolution: a MERGE whose source carries columns the
  * target lacks ADD-COLUMNs the target first (metadata-only,
  * field-id assigned, history NULL-padded), then the merge resolves
  * stock — via Spark 4's native `WITH SCHEMA EVOLUTION` clause
  * (ResolveMergeIntoSchemaEvolution -> alterTable) and via the
  * session conf `spark.graft.schema.autoMerge.enabled`. */
class MergeEvolutionSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_mevo").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gme", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gme.path", root)
  }

  test("MERGE ... WITH SCHEMA EVOLUTION adds source-only columns") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gme.t")
    spark.sql("CREATE TABLE gme.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gme.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(
      """SELECT 2L AS k, 'B' AS v, 'extra2' AS w
        |UNION ALL SELECT 3L, 'c', 'extra3'""".stripMargin)
      .createOrReplaceTempView("mevo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gme.t t
        |USING mevo_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT k, v, w FROM gme.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(rows == Seq((1L, "a", null), (2L, "B", "extra2"),
      (3L, "c", "extra3")), rows)
    // history NULL-pads, never backfills; evolution survives restart
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM gme.t WHERE w IS NULL")
      .head().getLong(0) == 1L)
  }

  test("session conf flips plain MERGE to schema evolution on graft " +
      "targets; without it stock semantics ignore the extra column") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gme.c")
    spark.sql("CREATE TABLE gme.c (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gme.c VALUES (1, 'a')")
    spark.sql("SELECT 1L AS k, 'A' AS v, 99L AS extra")
      .createOrReplaceTempView("mevo_c_src")
    val merge =
      """MERGE INTO gme.c t USING mevo_c_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin
    // no conf: stock semantics — the extra source column is IGNORED
    // (UPDATE SET * expands to target columns), no evolution
    spark.sql(merge)
    assert(!spark.table("gme.c").schema.fieldNames.contains("extra"),
      "without the conf the table must not evolve")
    withConf("spark.graft.schema.autoMerge.enabled" -> "true") {
      spark.sql(merge)
      val r = spark.sql("SELECT k, v, extra FROM gme.c").head()
      assert((r.getLong(0), r.getString(1), r.getLong(2)) ==
        (1L, "A", 99L))
    }
  }
}
