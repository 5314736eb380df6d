package graft.streaming

import graft.SparkTestBase
import graft.functions.{PiiScrub, RepetitionStats}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The per-row curation operators (PII scrub, repetition flags) are
  * pure column expressions, so they run unchanged at INGEST time under
  * Structured Streaming — scrubbing and quality-flagging arrive-time
  * rows is how a production pipeline avoids a second 100 TB pass.
  * Stateless = append mode, no watermark, and micro-batch boundaries
  * cannot change any per-row outcome. (The set-vs-set curation ops —
  * decontamination, semantic/substring dedup — batch over the
  * accumulated store instead, the q78 store-and-batch split.) */
class CurationStreamSpec extends SparkTestBase {

  test("PII scrub + repetition flags on a stream equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (1L to 300L).map { i =>
      val pii = if (i % 3 == 0) s" mail u$i@ex.org" else if (i % 5 == 0) " ip 10.0.0.9" else ""
      val rep = if (i % 4 == 0) "a b a b a b a b" else s"w$i x y z q r s t u v"
      (i, rep + pii)
    }
    def curate(df: DataFrame): DataFrame = {
      val toks = split(col("text"), " ")
      df.select(col("id"),
        PiiScrub.redact(col("text")).as("clean_text"),
        (PiiScrub.emailCount(col("text")) + PiiScrub.ipv4Count(col("text")) +
          PiiScrub.phoneCount(col("text"))).as("n_pii"),
        RepetitionStats.dupTokenFlag(toks, 60).as("flag_dup"),
        RepetitionStats.maxGram2Count(toks).as("max2"))
    }

    val mem = MemoryStream[(Long, String)]
    val q = curate(mem.toDF().toDF("id", "text"))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    mem.addData(rows.take(120): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(120): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("curation_stream")
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    val batch = curate(rows.toDF("id", "text"))
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    assert(streamed.length == rows.length)
    assert(streamed.toSeq == batch.toSeq,
      "streaming and batch curation must be identical")
    // and the scrub actually bit: some rows were redacted
    assert(spark.table("curation_stream").where(col("n_pii") > 0)
      .collect().forall(_.getString(1).contains("<")))
  }

  test("sliding-window chunking on a stream equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // chunking is a per-row explode (map-only), so it too runs
    // unchanged at ingest time; batch boundaries land BETWEEN
    // documents and can never split one document's chunk set
    val rows = (1L to 80L).map(i =>
      (i, (1 to (i % 37 + 3).toInt).map(t => s"w$t").mkString(" ")))
    def chunk(df: DataFrame): DataFrame =
      graft.operators.Chunker.chunks(df, "id", split(col("text"), " "),
        size = 16, stride = 12)

    val mem = MemoryStream[(Long, String)]
    val q = chunk(mem.toDF().toDF("id", "text"))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    mem.addData(rows.take(50): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(50): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("chunk_stream")
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    val batch = chunk(rows.toDF("id", "text"))
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
      "streaming and batch chunking must be identical")
  }
}
