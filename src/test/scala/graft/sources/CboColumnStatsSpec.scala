package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** `ANALYZE TABLE ... COMPUTE STATISTICS` + per-column CBO statistics:
  * the catalog computes NDV (distributed HyperLogLog) and byte widths
  * in one aggregate pass, persists them FIELD-ID keyed in the
  * `_colstats` sidecar, and serves them through
  * `estimateStatistics().columnStats()` — Spark translates those into
  * the logical plan's `attributeStats`, the input to
  * `spark.sql.cbo.enabled` join-reorder and filter estimation. Exact
  * nullCount/min/max ride the commit-log stats fold and merge in at
  * serve time. `numRows` is additionally FILTER-AWARE: a pushed
  * partition predicate re-estimates the scan at the surviving files.
  * Statistics steer plans, never results. */
class CboColumnStatsSpec extends SparkTestBase {

  private def setupCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmem.path", MemCatalog.defaultRoot)
  }

  test("ANALYZE lands NDV/lengths in attributeStats; exact " +
      "nullCount/min/max merge in") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.anat")
    spark.sql("CREATE TABLE graftmem.anat (k BIGINT, grp INT, s STRING)")
    spark.range(1000).selectExpr("id AS k", "CAST(id % 7 AS INT) AS grp",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE repeat('x', 200) END AS s")
      .createOrReplaceTempView("anat_src")
    spark.sql("INSERT INTO graftmem.anat SELECT * FROM anat_src")
    val res = spark.sql(
      "ANALYZE TABLE graftmem.anat COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect()
    assert(res.head.getString(1).contains("analyzed 3 columns"), res.toSeq)

    withConf("spark.sql.cbo.enabled" -> "true") {
      val stats = spark.table("graftmem.anat")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000)), stats)
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.keySet == Set("k", "grp", "s"), byName.keySet)
      // NDV: HLL estimate within 10% of truth
      val kNdv = byName("k").distinctCount.get.toLong
      assert(math.abs(kNdv - 1000) <= 100, s"k ndv=$kNdv")
      assert(byName("grp").distinctCount.get.toLong == 7,
        byName("grp").distinctCount)
      // exact nullCount from the commit-log fold (not ANALYZE)
      assert(byName("s").nullCount.contains(BigInt(100)), byName("s"))
      // exact min/max for integral columns
      assert(byName("k").min.contains(0L) && byName("k").max.contains(999L),
        byName("k"))
      // analyzed byte widths for the string column (~200 bytes)
      assert(byName("s").avgLen.exists(l => l >= 190 && l <= 210),
        byName("s").avgLen)
    }
  }

  test("analyzed string widths size the scan realistically " +
      "(broadcast decisions read it)") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.anaw")
    spark.sql("CREATE TABLE graftmem.anaw (k BIGINT, doc STRING)")
    spark.range(500).selectExpr("id AS k", "repeat('d', 400) AS doc")
      .createOrReplaceTempView("anaw_src")
    spark.sql("INSERT INTO graftmem.anaw SELECT * FROM anaw_src")
    val before = spark.table("graftmem.anaw")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    spark.sql("ANALYZE TABLE graftmem.anaw COMPUTE STATISTICS FOR COLUMNS doc")
    val after = spark.table("graftmem.anaw")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    // 400-byte strings vs the 20-byte StringType default: the sized
    // estimate must grow manyfold — a 2 KB-average document column
    // costed at 20 bytes would broadcast tables that flatten executors
    assert(after > before * 5, s"before=$before after=$after")
  }

  test("numRows is filter-aware: a pushed partition predicate " +
      "re-estimates at the surviving files and flips the join to broadcast") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.anap")
    spark.sql("CREATE TABLE graftmem.anap (k BIGINT, side STRING, pay STRING)" +
      " PARTITIONED BY (side)")
    // one fat partition, one thin one
    spark.range(20000).selectExpr("id AS k", "'fat' AS side",
      "repeat('p', 64) AS pay")
      .union(spark.range(50).selectExpr("id AS k", "'thin' AS side",
        "repeat('p', 64) AS pay"))
      .createOrReplaceTempView("anap_src")
    spark.sql("INSERT INTO graftmem.anap SELECT * FROM anap_src")

    val full = spark.table("graftmem.anap")
      .queryExecution.optimizedPlan.stats
    assert(full.rowCount.contains(BigInt(20050)), full)
    val thin = spark.table("graftmem.anap").where(col("side") === "thin")
      .queryExecution.optimizedPlan.stats
    assert(thin.rowCount.exists(_ <= BigInt(50)),
      s"filtered scan must re-estimate at surviving files: $thin")

    // the filtered side now broadcasts under a threshold the unfiltered
    // side exceeds: the DECISION demonstrably reads the filter-aware size
    val other = spark.range(30000).selectExpr("id AS k", "id AS v")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "65536",
        "spark.sql.adaptive.enabled" -> "false") {
      val filtered = other.join(
        spark.table("graftmem.anap").where(col("side") === "thin"), "k")
      assert(filtered.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        filtered.queryExecution.executedPlan)
      val unfiltered = other.join(spark.table("graftmem.anap"), "k")
      assert(!unfiltered.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        unfiltered.queryExecution.executedPlan)
      // statistics steer the plan, never the results
      assert(filtered.count() == 50)
      assert(unfiltered.count() == 20050)
    }
  }

  test("stats survive RENAME COLUMN (field-id keyed) and restart " +
      "(sidecar replay)") {
    setupCatalog()
    spark.sql("DROP TABLE IF EXISTS graftmem.anar")
    spark.sql("CREATE TABLE graftmem.anar (a BIGINT, b STRING)")
    spark.range(300).selectExpr("id AS a", "repeat('r', 50) AS b")
      .createOrReplaceTempView("anar_src")
    spark.sql("INSERT INTO graftmem.anar SELECT * FROM anar_src")
    spark.sql("ANALYZE TABLE graftmem.anar COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ALTER TABLE graftmem.anar RENAME COLUMN a TO a2")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val byName = spark.table("graftmem.anar")
        .queryExecution.optimizedPlan.stats.attributeStats
        .map { case (at, s) => at.name -> s }
      assert(byName.contains("a2") &&
        byName("a2").distinctCount.exists(_.toLong > 250),
        byName.get("a2"))
    }
    MemCatalog.simulateRestart()
    withConf("spark.sql.cbo.enabled" -> "true") {
      val byName = spark.table("graftmem.anar")
        .queryExecution.optimizedPlan.stats.attributeStats
        .map { case (at, s) => at.name -> s }
      assert(byName.contains("a2") &&
        byName("a2").distinctCount.exists(_.toLong > 250),
        s"sidecar must replay after restart: ${byName.keySet}")
    }
  }

  test("ANALYZE delegation: non-graft tables go to Spark's parser; " +
      "unknown column and complex types fail loudly") {
    setupCatalog()
    // v1 temp view: Spark's own ANALYZE error shape, not our command
    spark.range(5).createOrReplaceTempView("plainv")
    val e1 = intercept[Exception] {
      spark.sql("ANALYZE TABLE plainv COMPUTE STATISTICS")
    }
    assert(!e1.isInstanceOf[GraftSqlParseException], e1.getClass)

    spark.sql("DROP TABLE IF EXISTS graftmem.anae")
    spark.sql("CREATE TABLE graftmem.anae (k BIGINT)")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("ANALYZE TABLE graftmem.anae COMPUTE STATISTICS " +
        "FOR COLUMNS nosuch")
    }
    assert(e2.getMessage.contains("no such column"), e2.getMessage)
  }
}
