package graft.queries

import graft.multimodal.MediaOps

import org.apache.spark.sql.functions._

/** Declared queries for the multimodal column pipeline (SURVEY §2.3).
  * The decode stage is a documented stub (`MediaOps.decodeStub`), but
  * it is a DETERMINISTIC function of the payload hash, so the oracle
  * can replay the fake decode arithmetic from sha256 hex — the gate
  * checks the real plumbing end to end: binary encode, Dataset
  * mapPartitions decode pass, typed output schema. */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Metadata extraction over binary payloads. The fake decode's
    // width/height/duration are u16 reads of the payload's sha256 —
    // hex-sliceable in SQL.
    QueryDef("q29_media_meta",
      """SELECT doc_id AS media_id,
        |       octet_length(encode(text))::BIGINT AS n_bytes,
        |       sha256(text) AS sha,
        |       (('0x' || substr(sha256(text), 1, 4))::INT % 1920 + 1) AS width,
        |       (('0x' || substr(sha256(text), 5, 4))::INT % 1080 + 1) AS height,
        |       (('0x' || substr(sha256(text), 9, 4))::BIGINT * 100 + 1) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin) { (spark, dir) =>
      MediaOps.extractMeta(MediaOps.mediaFromDocuments(spark, dir))
        .toDF()
        .select(col("mediaId").as("media_id"), col("nBytes").as("n_bytes"),
          col("sha256").as("sha"), col("width"), col("height"),
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
