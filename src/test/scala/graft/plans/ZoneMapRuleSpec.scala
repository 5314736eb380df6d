package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.operators.ZoneMap
import graft.sources.Tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The automatic zone-map rewrite: a plain parquet read with a range
  * filter must open only overlapping files when a fresh persisted map
  * exists — and must be a no-op (never wrong, only unpruned) when the
  * rule is off, the map is missing, or the map is stale. */
class ZoneMapRuleSpec extends SparkTestBase {

  private val NumFiles = 16

  private def freshClustered(): String = {
    val dir = Files.createTempDirectory("zmrule").toString
    val path = s"$dir/li"
    ZoneMap.writeClustered(
      Tables.load(spark, sf0001, "lineitem"), "l_orderkey", NumFiles, path)
    path
  }

  private def rangeScan(path: String): DataFrame =
    spark.read.parquet(path).where(col("l_orderkey").between(100L, 400L))

  /** Files the optimized plan's relation would open. */
  private def plannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation =>
        r.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.toSeq
    }.flatten

  private def withRule[A](body: => A): A = {
    ZoneMapRule.install(spark)
    try body
    finally spark.conf.set(ZoneMapRule.EnabledKey, "false")
  }

  test("fresh map + range filter: FileScan pruned, result invisible") {
    val path = freshClustered()
    val baseline = rangeScan(path)
      .agg(count(lit(1)).cast("long"), sum(col("l_quantity"))).collect().head
    assert(plannedFiles(rangeScan(path)).length == NumFiles,
      "rule off: no pruning")
    ZoneMap.persist(spark, path, "l_orderkey")
    withRule {
      val files = plannedFiles(rangeScan(path))
      assert(files.length < NumFiles && files.nonEmpty,
        s"expected a pruned listing, got ${files.length} of $NumFiles")
      val pruned = rangeScan(path)
        .agg(count(lit(1)).cast("long"), sum(col("l_quantity"))).collect().head
      assert(pruned == baseline, "pruning must be result-invisible")
    }
  }

  test("no persisted map: rule is a no-op") {
    val path = freshClustered()
    withRule {
      assert(plannedFiles(rangeScan(path)).length == NumFiles)
    }
  }

  test("stale map (data newer than map) must not prune") {
    val path = freshClustered()
    ZoneMap.persist(spark, path, "l_orderkey")
    // age the map behind the data: a rewritten file could now hold any
    // key range, so pruning on the old zones would be wrong
    val marker = Paths.get(ZoneMap.zoneMapPath(path, "l_orderkey"), "_SUCCESS")
    val dataFile = Files.list(Paths.get(path))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    Files.setLastModifiedTime(dataFile,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(marker).toMillis + 5000))
    withRule {
      assert(plannedFiles(rangeScan(path)).length == NumFiles,
        "a stale zone map must never prune")
    }
  }

  test("filters on unmapped columns do not prune") {
    val path = freshClustered()
    ZoneMap.persist(spark, path, "l_orderkey")
    withRule {
      val other = spark.read.parquet(path)
        .where(col("l_linenumber").between(1L, 2L))
      assert(plannedFiles(other).length == NumFiles)
    }
  }

  test("over the file-count cap: no prune, same results") {
    val path = freshClustered()
    ZoneMap.persist(spark, path, "l_orderkey")
    val baseline = withRule {
      rangeScan(path).agg(count(lit(1)).cast("long")).collect().head.getLong(0)
    }
    spark.conf.set(ZoneMapRule.MaxFilesKey, (NumFiles - 1).toString)
    try withRule {
      // 16 files > cap of 15: the rule must decline to prune (bounding
      // its driver-side zone list) and the query must still be right
      assert(plannedFiles(rangeScan(path)).length == NumFiles,
        "over-cap table must scan unpruned")
      val got = rangeScan(path)
        .agg(count(lit(1)).cast("long")).collect().head.getLong(0)
      assert(got == baseline, "cap fallback must be result-invisible")
    } finally spark.conf.unset(ZoneMapRule.MaxFilesKey)
  }

  test("all-NULL-key files load as unknown zones instead of crashing planning") {
    // one file whose clustering key is entirely NULL: its zone map row
    // has NULL lo/hi (min/max skip nulls); planning must degrade to
    // keeping the file, never NPE
    val dir = Files.createTempDirectory("zmnull").toString
    val path = s"$dir/t"
    import org.apache.spark.sql.SaveMode
    spark.range(10).selectExpr("id AS k", "id AS payload")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    spark.range(5).selectExpr("CAST(NULL AS BIGINT) AS k", "id AS payload")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
    ZoneMap.persist(spark, path, "k")
    withRule {
      val df = spark.read.parquet(path).where(col("k").between(2L, 4L))
      // planning alone used to NPE on Row.getLong(null); force it and
      // the execution, and check the NULL-key file kept the result right
      assert(df.count() == 3L)
    }
  }

  test("boundary rows survive pruning (zone overlap is inclusive)") {
    val path = freshClustered()
    ZoneMap.persist(spark, path, "l_orderkey")
    val keys = Tables.load(spark, sf0001, "lineitem")
      .where(col("l_orderkey").between(100L, 400L))
      .select(col("l_orderkey")).distinct().count()
    withRule {
      val got = rangeScan(path).select(col("l_orderkey")).distinct().count()
      assert(got == keys, "every in-range key must survive the pruned scan")
    }
  }
}
