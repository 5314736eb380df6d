package graft.sources

import graft.SparkTestBase

/** Regression pins for the round-15 advisory findings:
  *
  *  1. FAST FORWARD is single-commit-point atomic: when a racer owns
  *     the base+1 version slot, NOTHING of the suffix remains
  *     published (no orphan base+2 commit a concurrent writer could
  *     trip over), and the operation aborts loudly.
  *  2. SHALLOW CLONE builds under `.staging/` and publishes with one
  *     atomic move — no residue after success.
  *  3. A PARAMETERIZED `INSERT INTO ... BY NAME` under
  *     `spark.graft.schema.autoMerge.enabled` executes through the
  *     stock pipeline (the bind rule must see the placeholders).
  *  4. ANALYZE ... FOR COLUMNS resolves case-insensitively.
  *  5. ALTER TABLE ... SET CLUSTERED BY resolves case-insensitively.
  */
class AdviceRegressionSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_advreg").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gadv", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gadv.path", root)
  }

  test("fast forward rolls back the invisible suffix when the base+1 " +
      "slot is taken") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gadv.prod")
    spark.sql("CREATE TABLE gadv.prod (k BIGINT)")
    spark.sql("INSERT INTO gadv.prod VALUES (1)")
    spark.sql("CREATE TABLE gadv.wap SHALLOW CLONE gadv.prod").collect()
    spark.sql("INSERT INTO gadv.wap VALUES (2)") // base+1
    spark.sql("INSERT INTO gadv.wap VALUES (3)") // base+2
    val t = MaintenanceSql.storeFor(spark, "gadv", "prod")
    val tLog = t.commitLog.get
    val base = t.currentVersion
    // simulate a cross-process racer owning the base+1 slot (the
    // in-memory store hasn't observed it, so the precheck passes and
    // publication reaches the final commit-point link)
    java.nio.file.Files.createFile(tLog.commitFilePath(base + 1))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gadv.prod FAST FORWARD TO gadv.wap").collect()
    }
    val msg = e.getMessage + " / " + String.valueOf(e.getCause)
    assert(msg.contains("rolled back"), msg)
    // the would-be-orphan base+2 commit must be GONE — a concurrent
    // writer's retry at base+2 must never replay our suffix
    assert(!java.nio.file.Files.exists(tLog.commitFilePath(base + 2)),
      "orphan base+2 commit left behind after aborted fast forward")
    // clear the simulated racer: publication now succeeds end-to-end
    java.nio.file.Files.delete(tLog.commitFilePath(base + 1))
    spark.sql("ALTER TABLE gadv.prod FAST FORWARD TO gadv.wap").collect()
    assert(spark.sql("SELECT sum(k) FROM gadv.prod").head().getLong(0) == 6L)
  }

  test("shallow clone leaves no .staging residue") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gadv.src")
    spark.sql("CREATE TABLE gadv.src (k BIGINT)")
    spark.sql("INSERT INTO gadv.src VALUES (1), (2)")
    spark.sql("DROP TABLE IF EXISTS gadv.c1")
    spark.sql("CREATE TABLE gadv.c1 SHALLOW CLONE gadv.src").collect()
    assert(spark.sql("SELECT count(*) FROM gadv.c1").head().getLong(0) == 2L)
    val staging = java.nio.file.Paths.get(root, ".staging")
    if (java.nio.file.Files.exists(staging)) {
      val left = java.nio.file.Files.list(staging)
      try assert(!left.iterator().asInstanceOf[java.util.Iterator[_]]
        .hasNext, "clone staging residue remains")
      finally left.close()
    }
  }

  test("parameterized INSERT BY NAME executes under autoMerge " +
      "(placeholders visible to the bind rule)") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gadv.pt")
    spark.sql("CREATE TABLE gadv.pt (k BIGINT, v STRING)")
    withConf("spark.graft.schema.autoMerge.enabled" -> "true") {
      spark.sql("INSERT INTO gadv.pt BY NAME SELECT ? AS k, ? AS v",
        Array(5L, "five"))
      val r = spark.sql("SELECT k, v FROM gadv.pt").head()
      assert((r.getLong(0), r.getString(1)) == (5L, "five"))
      // the non-parameterized path still auto-evolves
      spark.sql(
        "INSERT INTO gadv.pt BY NAME SELECT 6L AS k, 'six' AS v, 9L AS w")
      assert(spark.table("gadv.pt").schema.fieldNames.toSeq
        .contains("w"))
    }
  }

  test("ANALYZE ... FOR COLUMNS and SET CLUSTERED BY resolve " +
      "case-insensitively") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gadv.ci")
    spark.sql("CREATE TABLE gadv.ci (o_custkey BIGINT, note STRING)")
    spark.sql("INSERT INTO gadv.ci VALUES (1, 'a'), (2, 'b'), (2, 'c')")
    // uppercase identifiers must resolve (SQL identifiers are
    // case-insensitive by default)
    spark.sql(
      "ANALYZE TABLE gadv.ci COMPUTE STATISTICS FOR COLUMNS O_CUSTKEY")
      .collect()
    spark.sql("ALTER TABLE gadv.ci SET CLUSTERED BY (O_CUSTKEY)").collect()
    // and the clustered write still lands
    spark.sql("INSERT INTO gadv.ci VALUES (3, 'd')")
    assert(spark.sql("SELECT count(*) FROM gadv.ci").head().getLong(0) == 4L)
  }
}
