package graft.sources

import graft.SparkTestBase
import graft.queries.SourceQueries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition pruning is THE first-order scan lever at 100 TB: a
  * filter on the partition column must never read the other
  * partitions' files. (`DataFrame.inputFiles` reports the unpruned
  * relation, so the assertion reads the executed scan's `numFiles`
  * metric instead.) */
class PartitionPruneSpec extends SparkTestBase {

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Long = {
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // drive the actual physical scan
    val scan = qe.executedPlan.collect { case f: FileSourceScanExec => f }.head
    scan.metrics("numFiles").value
  }

  test("a partition-column filter reads only the matching directory") {
    val dir = "/root/testdata/sf0.001"
    val path = SourceQueries.partitionedEvents(spark, dir)

    val filtered = spark.read.parquet(path)
      .where(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("click"), plan)

    val prunedFiles = scanFileCount(filtered)
    val allFiles = scanFileCount(spark.read.parquet(path))
    assert(prunedFiles > 0)
    assert(prunedFiles < allFiles,
      s"pruning must reduce the file set ($prunedFiles vs $allFiles)")

    // and the pruned read still returns exactly the click rows
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type") === "click").count()
    assert(filtered.count() == expected)
  }
}
