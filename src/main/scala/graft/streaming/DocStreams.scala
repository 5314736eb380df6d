package graft.streaming

import graft.functions.TextSketches

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-dup sketching (SURVEY §2.2 "Streaming" x §2.3
  * near-dup): the MinHash and SimHash sketches are pure per-row
  * expressions, so the SAME column definitions run unchanged under
  * Structured Streaming — sketches are computed in-flight at ingest,
  * inside the scan/ingest stage with zero streaming state. The
  * banding + candidate self-join then runs as a batch pass over the
  * accumulated sketch store (the standard split for dedup pipelines:
  * per-row work streams, set-vs-set work batches over the store).
  */
object DocStreams {

  /** doc_id + MinHash signature (h00..h15, the one layout defined by
    * [[TextSketches.withMinhashSignature]]) + 60-bit SimHash for any
    * (doc_id, text) frame — batch or streaming; docs with fewer than 3
    * tokens carry no 3-gram sketch and are dropped, mirroring
    * [[graft.queries.NearDupQueries]]. */
  def sketched(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val filtered = docs
      .where(size(TextSketches.tokens(col("text"))) >= 3)
      .select(col("doc_id"), col("text"),
        TextSketches.shingles(col("text"), 3).as("s"))
    TextSketches.withMinhashSignature(filtered, shingleCol = "s")
      .withColumn("simhash", graft.functions.GraftFunctions.simhash60(col("text")))
      .drop("text", "s")
  }

  /** Winnowing fingerprints at ingest: the per-row array form of
    * [[graft.operators.Winnow]] selection — no window, no state, so
    * the same column definition streams; the overlap join then runs
    * as a batch pass over the accumulated fingerprint store, exactly
    * like [[sketched]]'s MinHash split. */
  def winnowed(docs: DataFrame): DataFrame =
    graft.operators.Winnow.withFingerprintKeys(docs, "doc_id", "text")
}
