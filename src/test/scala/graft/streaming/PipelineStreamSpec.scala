package graft.streaming

import graft.SparkTestBase
import graft.operators.{DataSplit, StratifiedSample}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The split/sample operators are pure per-row hash expressions, so
  * they must run unchanged on a streaming ingest (assigning folds and
  * sampling at ARRIVAL time is how a production pipeline avoids a
  * second full pass over 100 TB). Stateless = append mode with no
  * watermark, and — because fold/keep depend only on (seed, id) —
  * the micro-batch boundaries can never change an assignment. */
class PipelineStreamSpec extends SparkTestBase {

  test("hash split + stratified sample on a stream equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (1L to 500L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      StratifiedSample.sampleBy(
        DataSplit.withFold(df, "id", "s1"),
        "id", "lang", Map("en" -> 2500), defaultBp = 10000, seed = "s2")

    val mem = MemoryStream[(Long, String)]
    val q = pipeline(mem.toDF().toDF("id", "lang"))
      .writeStream.format("memory").queryName("split_sample_stream")
      .outputMode("append").start()
    // two micro-batches: assignments must not depend on batch boundaries
    mem.addData(rows.take(200): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(200): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("split_sample_stream")
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    val batch = pipeline(rows.toDF("id", "lang"))
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    assert(streamed.nonEmpty && streamed.length < rows.length,
      "sampling must keep a strict, non-empty subset")
    assert(streamed.toSeq == batch.toSeq,
      "streaming and batch split+sample must be identical")
  }
}
