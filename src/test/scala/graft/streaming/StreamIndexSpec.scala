package graft.streaming

import graft.SparkTestBase
import graft.operators.Bm25

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming maintenance of the q0t inverted-index artifact: each
  * micro-batch's documents build a DELTA index (q142 shape) that
  * [[Bm25.mergeIndex]] folds into the accumulated index — the q78
  * store-and-batch discipline applied to the retrieval artifact, so
  * the index stays current at ingest time without ever re-scanning
  * the corpus. Batch boundaries must be invisible: the result after N
  * batches has to equal a from-scratch rebuild over everything
  * ingested (q146 proves one fold; this proves the fold CHAIN under
  * Structured Streaming's execution).
  *
  * In production the accumulated side is the persisted artifact
  * (IndexStore read → merge → atomic swap per batch); here it is a
  * localCheckpoint'ed frame so the spec exercises exactly the merge
  * chain without filesystem noise.
  */
class StreamIndexSpec extends SparkTestBase {

  test("per-batch index merges under foreachBatch equal a full rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    def toIndex(df: DataFrame): DataFrame =
      Bm25.buildIndex(df.select(col("doc_id"), split(col("text"), " ").as("t")),
        "doc_id", "t", 100)

    var acc: Option[DataFrame] = None
    var batches = 0
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val delta = toIndex(batch)
          acc = Some(acc.map(a => Bm25.mergeIndex(a, delta)).getOrElse(delta)
            .localCheckpoint())
          batches += 1
        }
      }
      .start()
    // three uneven batches, ids interleaved across posting blocks
    mem.addData(docs.filter(_._1 % 3 == 0): _*)
    q.processAllAvailable()
    mem.addData(docs.filter(_._1 % 3 == 1): _*)
    q.processAllAvailable()
    mem.addData(docs.filter(_._1 % 3 == 2): _*)
    q.processAllAvailable()
    q.stop()

    assert(batches >= 3, s"expected >=3 non-empty micro-batches, got $batches")
    def canon(df: DataFrame) =
      df.select("term", "block", "n_docs", "sum_tf", "postings")
        .as[(String, Long, Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val streamed = canon(acc.get)
    val full = canon(toIndex(docs.toDF("doc_id", "text")))
    assert(streamed == full,
      "accumulated streaming index must equal the from-scratch rebuild")
  }
}
