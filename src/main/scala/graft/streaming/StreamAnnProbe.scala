package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING ANN probe (SURVEY §2.2 streaming x §2.3 similarity):
  * query vectors stream in, and each micro-batch probes the SAME
  * persisted IVF-PQ artifact the batch search (q108) scans — the
  * online-serving half of the ANN story, where the index is a
  * scheduled-ETL artifact and probes are a continuous query stream.
  * The probe per batch is [[SimilarityQueries.ivfPqTopKOf]] verbatim,
  * so streaming and batch search can never drift.
  *
  * Exactly-once: as [[StreamNearDup]], each micro-batch overwrites
  * its own `batch=<id>` partition, so a replayed batch (restart
  * between sink write and checkpoint commit) rewrites instead of
  * duplicating — and per-query independence means arrival batching
  * is result-invisible (the two-batch parity spec pins streamed ==
  * batch rows exactly).
  *
  * Scale shape: the artifact side of each probe reads 8 code bytes +
  * a norm per vector for only the nprobe probed cells; the arriving
  * query batch is broadcast. Nothing in the micro-batch path scans
  * the corpus vectors except the tiny shortlist rerank. */
object StreamAnnProbe {

  /** Start the probe sink on a streaming (vec_id, embedding) frame. */
  def startProbe(queries: DataFrame, dir: String, storePath: String,
      checkpointPath: String): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SimilarityQueries.ivfPqTopKOf(batch.sparkSession, dir, batch)
          .write.mode("overwrite")
          .parquet(s"$storePath/batch=$batchId")
      }
      .start()

  /** All probe results written so far, in the gate's (qid, rank)
    * order. Read on a quiesced store (see [[StreamNearDup]]'s note on
    * replay-vs-reader races). */
  def storeResults(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
      .orderBy(col("qid"), col("rank"))
}
