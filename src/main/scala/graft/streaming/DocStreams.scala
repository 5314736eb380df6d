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

  private val NumHashes = 16

  /** doc_id + 16-component MinHash signature + 60-bit SimHash for any
    * (doc_id, text) frame — batch or streaming; docs with fewer than 3
    * tokens carry no 3-gram sketch and are dropped, mirroring
    * [[graft.queries.NearDupQueries]]. */
  def sketched(docs: DataFrame): DataFrame = {
    val filtered = docs
      .where(size(TextSketches.tokens(col("text"))) >= 3)
      .select(col("doc_id"), col("text"),
        TextSketches.shingles(col("text"), 3).as("s"))
    val withMd5 = filtered.select(
      col("doc_id") +: col("text") +: (0 until NumHashes / 4)
        .map(k => TextSketches.minhashMd5(k, col("s")).as(s"m$k")): _*)
    withMd5.select(
      col("doc_id") +:
        TextSketches.simhash(col("text")).as("simhash") +:
        (0 until NumHashes)
          .map(i => TextSketches.minhashSlice(i % 4, col(s"m${i / 4}"))
            .as(f"h$i%02d")): _*)
  }
}
