package graft.streaming

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Streaming CDC apply into the durable v2 catalog — the
  * foreachBatch + MERGE pattern every lakehouse streaming ingest
  * uses: each micro-batch's changes (latest-per-key) merge into the
  * table transactionally, so the table state after the stream equals
  * the batch apply of the same changelog, and the commit log records
  * one version per micro-batch. */
class StreamUpsertSpec extends SparkTestBase {

  import spark.implicits._

  test("foreachBatch MERGE applies a streamed changelog; versions = micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cat_stream")
    spark.conf.set("spark.sql.catalog.graftstr",
      classOf[graft.sources.MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftstr.path", root.toString)
    spark.sql("DROP TABLE IF EXISTS graftstr.acc")
    spark.sql("CREATE TABLE graftstr.acc (k BIGINT, bal DOUBLE)")

    // changelog: (key, version-within-batch, op, balance)
    val b1 = Seq((1L, 1L, "U", 10.0), (2L, 1L, "U", 20.0), (3L, 1L, "U", 30.0))
    val b2 = Seq((2L, 2L, "U", 25.0), (3L, 2L, "D", 0.0), (4L, 1L, "U", 40.0),
      (4L, 2L, "U", 44.0)) // two changes for key 4 in ONE batch
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Double)]
    val q = mem.toDF().toDF("k", "ver", "op", "bal")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.createOrReplaceTempView("cdc_batch")
        // latest change per key first — MERGE rejects multi-matches
        batch.sparkSession.sql(
          """MERGE INTO graftstr.acc t
            |USING (SELECT k, op, bal FROM (
            |         SELECT k, op, bal,
            |                row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
            |         FROM cdc_batch) z WHERE rn = 1) s
            |ON t.k = s.k
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET bal = s.bal
            |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (k, bal) VALUES (s.k, s.bal)
            |""".stripMargin)
        ()
      }
      .start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()

    val got = spark.table("graftstr.acc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 25.0, 4L -> 44.0), got.toString)

    // one commit version per micro-batch MERGE (v0 create, v1/v2
    // merges), all durable — a restart replays the streamed state
    val versions = graft.sources.MemCatalog.history(spark, "graftstr", "acc")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(versions == Seq(0L, 1L, 2L), versions.toString)
    graft.sources.MemCatalog.simulateRestart()
    assert(spark.table("graftstr.acc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap == got)

    // the streamed MERGEs land as DELTA commits: each micro-batch's
    // file holds only its changes (batch 2 = 1 update + 1 delete +
    // 1 insert), never the surviving row set — the shape that keeps a
    // continuous CDC ingest O(changes/batch) at 100 TB
    def commitSize(v: Int) = java.nio.file.Files.size(
      root.resolve("acc").resolve(f"$v%08d.commit"))
    assert(commitSize(1) < 500 && commitSize(2) < 500,
      s"streamed commits must be delta-sized: v1=${commitSize(1)}B v2=${commitSize(2)}B")

    // foreachBatch RETRY semantics: re-applying the last batch's MERGE
    // (the failure-recovery path) must leave the state unchanged —
    // updates rewrite the same values, the delete no-ops, the insert
    // turns into a matched same-value update
    spark.createDataset(b2).toDF("k", "ver", "op", "bal")
      .createOrReplaceTempView("cdc_batch_retry")
    spark.sql(
      """MERGE INTO graftstr.acc t
        |USING (SELECT k, op, bal FROM (
        |         SELECT k, op, bal,
        |                row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        |         FROM cdc_batch_retry) z WHERE rn = 1) s
        |ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET bal = s.bal
        |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (k, bal) VALUES (s.k, s.bal)
        |""".stripMargin)
    assert(spark.table("graftstr.acc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap == got,
      "re-applied batch changed the state")
    assert(commitSize(3) < 500, "the retry commit must also be a delta")
  }
}
