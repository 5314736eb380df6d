package graft.streaming

import graft.queries.NearDupQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** END-TO-END streaming near-dup (SURVEY §2.2 streaming x §2.3
  * near-dup): documents stream in, per-row sketches (the SAME
  * [[DocStreams.sketched]] columns the batch pipeline uses) are
  * appended to a parquet SKETCH STORE by `foreachBatch`, and the
  * candidate pass runs as an incremental batch join over the
  * accumulated store — the standard split for dedup pipelines:
  * per-row work streams, set-vs-set work batches.
  *
  * Exactly-once: each micro-batch writes its own `batch=<id>`
  * partition directory with OVERWRITE, so a replayed batch (restart
  * between sink write and checkpoint commit) rewrites the same
  * partition instead of duplicating rows — the idempotent-sink
  * pattern Structured Streaming's foreachBatch contract asks for.
  *
  * Scale shape: the store carries (doc_id, 16 signature longs,
  * simhash) — ~150 bytes/doc, NOT the documents; the candidate join
  * is the banded equi-join of [[NearDupQueries]], shared verbatim so
  * streaming and batch banding can never drift. An INCREMENTAL pass
  * (new batch x accumulated store) touches only pairs involving new
  * docs — q78 gates that incremental arrival reproduces the full-
  * batch candidate set exactly.
  */
object StreamNearDup {

  /** Start the sketch-store sink on a streaming (doc_id, text) frame. */
  def startSketchStore(docs: DataFrame, storePath: String,
      checkpointPath: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DocStreams.sketched(batch).write.mode("overwrite")
          .parquet(s"$storePath/batch=$batchId")
      }
      .start()

  /** The periodic candidate pass over the whole accumulated store:
    * banded LSH candidates from every signature written so far.
    *
    * Run this on a QUIESCED store (between micro-batches, or after
    * `StreamingQuery.processAllAvailable`/`stop`): the sink's
    * overwrite of a replayed `batch=<id>` partition is not atomic
    * with respect to a concurrent reader, so a pass racing a live
    * replay could miss that batch's files. In production the pass is
    * a scheduled batch job reading a snapshot/previous-batch
    * watermark, not a concurrent tail. */
  def storeCandidates(spark: SparkSession, storePath: String): DataFrame =
    NearDupQueries.candidatesOf(NearDupQueries.bandsOf(
        spark.read.parquet(storePath)))
      .orderBy(col("doc_a"), col("doc_b"))
}
