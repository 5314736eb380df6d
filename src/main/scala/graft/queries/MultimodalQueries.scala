package graft.queries

import graft.multimodal.MediaOps

import org.apache.spark.sql.functions._

/** Declared queries for the multimodal column pipeline (SURVEY §2.3).
  * Image dimensions are REALLY decoded: `mediaFromDocuments` plants
  * PNG IHDR / JPEG SOF headers carrying id-derived dimensions, the
  * Spark side recovers them by parsing the BYTES ([[graft.multimodal
  * .MediaCodec]]), and the oracle re-derives them from the id
  * arithmetic independently — the compare can only pass if the header
  * parse is correct. */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Metadata extraction over binary payloads: kind by id parity,
    // n_bytes = real header size (PNG 33 / JPEG 15) + utf-8 body,
    // width/height parsed from the header bytes, duration 0 (image).
    QueryDef("q29_media_meta",
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS kind,
        |       (CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 15 END
        |          + octet_length(encode(text)))::BIGINT AS n_bytes,
        |       (doc_id * 7 % 1920 + 1)::INT AS width,
        |       (doc_id * 13 % 1080 + 1)::INT AS height,
        |       0::BIGINT AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin) { (spark, dir) =>
      MediaOps.extractMeta(MediaOps.mediaFromDocuments(spark, dir))
        .toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
          col("nBytes").as("n_bytes"), col("width"), col("height"),
          col("durationMs").as("duration_ms"))
        .orderBy(col("media_id"))
    },

    // Feature extraction shape: rows-only driver check (the stub
    // features are deterministic but not worth 64 columns of oracle
    // SQL); spec-verified instead.
    QueryDef.noOracle("q30_media_features") { (spark, dir) =>
      MediaOps.extractFeatures(MediaOps.mediaFromDocuments(spark, dir), dim = 16)
        .toDF()
        .select(col("mediaId").as("media_id"),
          size(col("feature")).as("dim"),
          element_at(col("feature"), 1).as("f0"))
        .orderBy(col("media_id"))
    }
  )
}
