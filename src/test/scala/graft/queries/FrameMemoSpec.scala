package graft.queries

import graft.SparkTestBase

class FrameMemoSpec extends SparkTestBase {

  test("memoized builds once per key and invalidate forces a rebuild") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((1L, "a")).toDF("id", "v") }

    val first = FrameMemo.memoized(spark, "spec#frame")(build)
    val second = FrameMemo.memoized(spark, "spec#frame")(build)
    assert(builds == 1, "second call must hit the memo")
    assert(first eq second, "the same materialized frame is returned")
    assert(second.count() == 1)

    FrameMemo.invalidate(spark)
    FrameMemo.memoized(spark, "spec#frame")(build)
    assert(builds == 2, "invalidate must force a rebuild")
  }

  test("keys are namespaced: different tags build independently") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq(1L).toDF("id") }
    FrameMemo.memoized(spark, "spec#a")(build)
    FrameMemo.memoized(spark, "spec#b")(build)
    assert(builds == 2)
  }

  test("checkpointed honors the reliable conf: lineage truncates through the checkpoint dir") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.col("id") * 2)

    // default (local) path: executor-resident, no checkpoint files
    val local = FrameMemo.checkpointed(df)
    assert(local.count() == 100)

    withConf(FrameMemo.ReliableKey -> "true") {
      val reliable = FrameMemo.checkpointed(df)
      assert(reliable.count() == 100)
      assert(reliable.collect().map(_.getLong(1)).sorted
        sameElements local.collect().map(_.getLong(1)).sorted)
      // the reliable path must have set a checkpoint dir and written
      // RDD checkpoint files into it — that is what survives executor
      // loss after the lineage was truncated
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.isDefined, "reliable path must establish a checkpoint dir")
      val files = new java.io.File(new java.net.URI(dir.get).getPath).listFiles()
      assert(files != null && files.nonEmpty,
        "reliable checkpoint must materialize files in the checkpoint dir")
      // and the plan must be cut: the checkpointed frame's logical plan
      // scans materialized rows instead of the original projection
      assert(reliable.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    }
  }
}
