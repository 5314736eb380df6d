package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Mechanics of small-file compaction: the plan's file-count math,
  * the no-shuffle physical shape of the default path, content
  * equality through the rewrite, and the balanced (AQE REBALANCE)
  * variant. Result-invisibility against the DuckDB oracle is q130. */
class CompactSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = new java.io.File(s"target/graft_test/compact_$tag")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    if (d.exists()) deleteRec(d)
    d.getAbsolutePath
  }

  private def dataFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  private def stageFragmented(tag: String, nFiles: Int): String = {
    val path = freshDir(tag)
    spark.range(0, 10000).select(col("id"), (col("id") % 97).as("k"))
      .repartition(nFiles).write.parquet(path)
    path
  }

  test("plan sizes the input and fixes targetFiles = ceil(bytes/target)") {
    val in = stageFragmented("plan", 16)
    assert(dataFiles(in).length == 16)
    val total = dataFiles(in).map(_.length).sum
    val p = Compact.plan(spark, in, targetBytes = total / 3)
    assert(p.inputFiles == 16)
    assert(p.totalBytes == total)
    val t = total / 3
    assert(p.targetFiles == ((total + t - 1) / t).toInt)
  }

  test("default rewrite is a narrow Coalesce — no Exchange in the plan") {
    val in = stageFragmented("narrow", 8)
    val p = Compact.plan(spark, in, targetBytes = Long.MaxValue)
    val plan = Compact.compacted(spark.read.parquet(in), p, balanced = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("rewrite produces exactly targetFiles files with identical content") {
    val in = stageFragmented("rw", 24)
    val total = dataFiles(in).map(_.length).sum
    val out = freshDir("rw_out")
    val p = Compact.rewrite(spark, in, out, targetBytes = total / 4 + 1)
    assert(p.inputFiles == 24)
    assert(dataFiles(out).length == p.targetFiles)
    assert(p.targetFiles < 24)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("already-compact input degrades to a no-op single-file copy") {
    val in = stageFragmented("noop", 1)
    val out = freshDir("noop_out")
    val p = Compact.rewrite(spark, in, out, targetBytes = Long.MaxValue)
    assert(p.targetFiles == 1)
    assert(dataFiles(out).length == 1)
  }

  test("balanced mode shuffles (REBALANCE) but preserves content") {
    val in = stageFragmented("bal", 12)
    val out = freshDir("bal_out")
    val p = Compact.rewrite(spark, in, out, targetBytes = Long.MaxValue,
      balanced = true)
    val plan = Compact.compacted(spark.read.parquet(in), p, balanced = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"), plan)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("plan rejects a non-positive byte target") {
    val in = stageFragmented("neg", 2)
    intercept[IllegalArgumentException] {
      Compact.plan(spark, in, targetBytes = 0)
    }
  }
}
