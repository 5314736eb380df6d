package graft.streaming

import graft.SparkTestBase

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DocStreamsSpec extends SparkTestBase {

  test("streaming sketches equal the batch twin row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content with many unusual tokens here"),
      (4L, "too short")) // < 3 tokens after shingling guard? 2 tokens -> dropped

    val mem = MemoryStream[(Long, String)]
    val q = DocStreams.sketched(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("doc_sketches")
      .outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("doc_sketches")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val batch = DocStreams.sketched(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)

    assert(streamed.length == 3, "the 2-token doc must be dropped")
    assert(streamed.toSeq == batch.toSeq,
      "streaming and batch sketches must be bit-identical")
  }

  test("sketching is stateless streaming: append mode with no watermark required") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // starting in append mode without watermark/state proves the
    // sketch pipeline adds no stateful operator to the stream
    val q = DocStreams.sketched(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("doc_sketches_stateless")
      .outputMode("append").start()
    mem.addData((10L, "alpha beta gamma delta"))
    q.processAllAvailable()
    val n1 = spark.table("doc_sketches_stateless").count()
    mem.addData((11L, "epsilon zeta eta theta"))
    q.processAllAvailable(); q.stop()
    val n2 = spark.table("doc_sketches_stateless").count()
    assert(n1 == 1 && n2 == 2)
  }

  test("winnowing fingerprints stream at ingest, bit-identical to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z y x a b c d e f w"),
      (3L, "one two three")) // < K tokens of grams -> empty key array
    val mem = MemoryStream[(Long, String)]
    val q = DocStreams.winnowed(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("winnow_stream")
      .outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("winnow_stream")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    val batch = DocStreams.winnowed(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    assert(streamed == batch)
    assert(streamed(1L).nonEmpty && streamed(3L).isEmpty)
  }
}
