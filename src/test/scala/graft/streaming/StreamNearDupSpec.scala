package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.queries.NearDupQueries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamNearDupSpec extends SparkTestBase {

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different content with many unusual tokens here"),
    (4L, "the quick brown fox jumps over the lazy dog today"),
    (5L, "another unrelated document about spark structured streaming state"))

  test("sketch store + candidate pass equals the batch pipeline over two batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_sketch_store").toString
    val ckpt = Files.createTempDirectory("graft_sketch_ckpt").toString

    val mem = MemoryStream[(Long, String)]
    val q = StreamNearDup.startSketchStore(
      mem.toDF().toDF("doc_id", "text"), store, ckpt)
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable(); q.stop()

    val streamed = StreamNearDup.storeCandidates(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batchSigs = DocStreams.sketched(docs.toDF("doc_id", "text"))
    val batch = NearDupQueries.candidatesOf(NearDupQueries.bandsOf(batchSigs))
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(batch.nonEmpty, "fixture must contain at least one near-dup pair")
    assert(streamed == batch,
      "candidates from the streamed store must equal the batch pipeline's")
  }

  test("a replayed micro-batch overwrites its partition instead of duplicating") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_sketch_store2").toString

    val mem = MemoryStream[(Long, String)]
    // two different checkpoints over the same store simulate a replay
    // of batch 0 after a checkpoint loss — the batch=0 partition must
    // be overwritten, not appended
    val c1 = Files.createTempDirectory("graft_ckpt_a").toString
    val q1 = StreamNearDup.startSketchStore(
      mem.toDF().toDF("doc_id", "text"), store, c1)
    mem.addData(docs.take(3): _*)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(store).count()

    val mem2 = MemoryStream[(Long, String)]
    val c2 = Files.createTempDirectory("graft_ckpt_b").toString
    val q2 = StreamNearDup.startSketchStore(
      mem2.toDF().toDF("doc_id", "text"), store, c2)
    mem2.addData(docs.take(3): _*)
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(store).count()

    assert(n1 == n2, s"replayed batch must be idempotent: $n1 -> $n2")
  }
}
