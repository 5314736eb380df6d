package graft.plans

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The MV rewrite must be result-invisible, serve coarser groupings,
  * and decline on staleness / distinct / non-derivable aggregates. */
class MvRewriteSpec extends SparkTestBase {

  private val basePath = "/root/testdata/sf0.001/orders.parquet"

  private def q(groupCols: Seq[String]) = {
    val base = spark.read.parquet(basePath)
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("csum"),
        min(col("o_orderkey")).as("kmin"), max(col("o_orderkey")).as("kmax"))
      .orderBy(groupCols.map(col): _*)
  }

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("fresh MV serves exact + coarser groupings result-invisibly; plan reads the artifact") {
    MvRewriteRule.clear()
    val mv = MvRewriteRule.create(spark, basePath,
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_custkey", "o_orderkey"))
    val plain = collectRows(q(Seq("o_orderstatus", "o_orderpriority")))
    val plainCoarse = collectRows(q(Seq("o_orderstatus")))
    MvRewriteRule.scoped(spark) {
      val exact = q(Seq("o_orderstatus", "o_orderpriority"))
      val coarse = q(Seq("o_orderstatus"))
      // physical FileScan strings truncate long paths
      // (maxMetadataStringLength) — the partial columns prove the scan
      def servedByMv(df: org.apache.spark.sql.DataFrame) = {
        val p = df.queryExecution.optimizedPlan.toString
        p.contains("__cnt") && p.contains("__sum_o_custkey")
      }
      assert(servedByMv(exact), "exact-grouping plan does not scan the MV")
      assert(servedByMv(coarse), "coarser-grouping plan does not scan the MV")
      assert(collectRows(exact) == plain)
      assert(collectRows(coarse) == plainCoarse)
    }
  }

  test("declines: non-subset grouping, distinct, non-measure sum, avg, disabled") {
    MvRewriteRule.clear()
    val mv = MvRewriteRule.create(spark, basePath,
      Seq("o_orderstatus"), Seq("o_custkey"))
    val base = spark.read.parquet(basePath)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    MvRewriteRule.scoped(spark) {
      // grouping outside the key set
      assert(!planOf(base.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))).contains("__cnt"))
      // distinct aggregate
      assert(!planOf(base.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n"))).contains("__cnt"))
      // sum over an unregistered measure
      assert(!planOf(base.groupBy(col("o_orderstatus"))
        .agg(sum(col("o_orderkey")).as("s"))).contains("__cnt"))
      // avg re-associates float division: declined
      assert(!planOf(base.groupBy(col("o_orderstatus"))
        .agg(avg(col("o_custkey")).as("a"))).contains("__cnt"))
      // count(col) counts non-nulls — not derivable from __cnt
      assert(!planOf(base.groupBy(col("o_orderstatus"))
        .agg(count(col("o_custkey")).as("n"))).contains("__cnt"))
    }
    // flag off: untouched
    assert(!planOf(base.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))).contains("__cnt"))
  }

  test("a stale MV never serves (base newer than the artifact)") {
    MvRewriteRule.clear()
    val tmp = java.nio.file.Files.createTempDirectory("mv_stale").toString
    val dir = s"$tmp/t.parquet"
    spark.range(100).selectExpr("id % 7 AS g", "id AS v")
      .write.mode("overwrite").parquet(dir)
    val mv = MvRewriteRule.create(spark, dir, Seq("g"), Seq("v"))
    Thread.sleep(1100) // fs mtime granularity
    spark.range(100, 140).selectExpr("id % 7 AS g", "id AS v")
      .write.mode("append").parquet(dir)
    val df = spark.read.parquet(dir).groupBy(col("g"))
      .agg(sum(col("v")).as("s")).orderBy(col("g"))
    MvRewriteRule.scoped(spark) {
      assert(!df.queryExecution.optimizedPlan.toString.contains("__cnt"),
        "stale MV served a rewritten aggregate")
      // and the un-rewritten answer reflects the appended rows
      assert(df.agg(sum(col("s"))).head().getLong(0) == (0L until 140L).sum)
    }
  }

  test("incremental refresh equals a full rebuild and re-arms the rewrite") {
    MvRewriteRule.clear()
    val tmp = java.nio.file.Files.createTempDirectory("mv_refresh").toString
    val dir = s"$tmp/t.parquet"
    spark.range(200).selectExpr("id % 5 AS g", "id AS v")
      .write.mode("overwrite").parquet(dir)
    val mv = MvRewriteRule.create(spark, dir, Seq("g"), Seq("v"))
    // delta lands in the base AND folds into the artifact (new group 9
    // included — the full-outer branch)
    Thread.sleep(1100)
    val delta = spark.range(200, 260)
      .selectExpr("CASE WHEN id < 230 THEN id % 5 ELSE 9 END AS g", "id AS v")
    delta.write.mode("append").parquet(dir)
    MvRewriteRule.refresh(spark, mv, delta)
    // folded partials == partials rebuilt from the appended base
    val folded = spark.read.parquet(mv.mvPath)
      .orderBy("g").collect().map(_.toSeq).toSeq
    val rebuilt = spark.read.parquet(dir).groupBy(col("g"))
      .agg(count(lit(1)).as("__cnt"), sum(col("v")).as("__sum_v"),
        min(col("v")).as("__min_v"), max(col("v")).as("__max_v"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(folded == rebuilt)
    // the refreshed artifact is newer than the appended base: serves
    MvRewriteRule.scoped(spark) {
      val df = spark.read.parquet(dir).groupBy(col("g"))
        .agg(sum(col("v")).as("s"))
      assert(df.queryExecution.optimizedPlan.toString.contains("__cnt"))
      assert(df.agg(sum(col("s"))).head().getLong(0) == (0L until 260L).sum)
    }
  }

  test("refresh keeps NULL for an all-NULL group's sum (Sum semantics, not 0)") {
    MvRewriteRule.clear()
    val tmp = java.nio.file.Files.createTempDirectory("mv_nullsum").toString
    val dir = s"$tmp/t.parquet"
    // group 7's measure is NULL in every row, base and delta alike
    spark.range(40).selectExpr("id % 4 AS g",
      "IF(id % 4 = 3, NULL, id) AS v")
      .selectExpr("IF(g = 3, 7, g) AS g", "v")
      .write.mode("overwrite").parquet(dir)
    val mv = MvRewriteRule.create(spark, dir, Seq("g"), Seq("v"))
    Thread.sleep(1100)
    val delta = spark.range(40, 60).selectExpr("id % 4 AS g",
      "IF(id % 4 = 3, NULL, id) AS v")
      .selectExpr("IF(g = 3, 7, g) AS g", "v")
    delta.write.mode("append").parquet(dir)
    MvRewriteRule.refresh(spark, mv, delta)
    val folded = spark.read.parquet(mv.mvPath)
      .orderBy("g").collect().map(_.toSeq).toSeq
    val rebuilt = spark.read.parquet(dir).groupBy(col("g"))
      .agg(count(lit(1)).as("__cnt"), sum(col("v")).as("__sum_v"),
        min(col("v")).as("__min_v"), max(col("v")).as("__max_v"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(folded == rebuilt,
      s"all-NULL group diverged:\n$folded\nvs\n$rebuilt")
    // and the rewrite serves the NULL through SUM
    MvRewriteRule.scoped(spark) {
      val df = spark.read.parquet(dir).groupBy(col("g"))
        .agg(sum(col("v")).as("s"))
      assert(df.queryExecution.optimizedPlan.toString.contains("__cnt"))
      val row7 = df.filter(col("g") === 7).head()
      assert(row7.isNullAt(1), s"expected NULL sum for group 7, got $row7")
    }
  }

  test("float measures are refused at registration") {
    val e = intercept[IllegalArgumentException](
      MvRewriteRule.create(spark, basePath, Seq("o_orderstatus"),
        Seq("o_totalprice")))
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
