package graft.queries

import graft.multimodal.MediaOps

import org.apache.spark.sql.functions._

/** Declared queries for the multimodal column pipeline (SURVEY §2.3).
  * Metadata is REALLY decoded for all four kinds: `mediaFromDocuments`
  * plants PNG IHDR / JPEG SOF headers carrying id-derived dimensions
  * and WAV fmt/data / MP4 mvhd headers carrying id-derived durations;
  * the Spark side recovers them by parsing the BYTES ([[graft
  * .multimodal.MediaCodec]]), and the oracle re-derives them from the
  * id arithmetic independently — the compare can only pass if the
  * header parses are correct. */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Metadata extraction over binary payloads: kind by id % 4,
    // n_bytes = real header size (PNG 33 / JPEG 15 / WAV 44 / MP4 144)
    // + utf-8 body, width/height parsed from image header bytes (0 for
    // the time-based kinds), duration from WAV data-over-byte-rate /
    // MP4 mvhd ticks-over-timescale math (0 for images).
    QueryDef("q29_media_meta",
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |            WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS kind,
        |       (CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 15
        |             WHEN 2 THEN 44 ELSE 144 END
        |          + octet_length(encode(text)))::BIGINT AS n_bytes,
        |       (CASE WHEN doc_id % 4 < 2 THEN doc_id * 7 % 1920 + 1 ELSE 0 END)::INT AS width,
        |       (CASE WHEN doc_id % 4 < 2 THEN doc_id * 13 % 1080 + 1 ELSE 0 END)::INT AS height,
        |       (CASE doc_id % 4
        |             WHEN 2 THEN octet_length(encode(text))::BIGINT * 1000
        |                  // ((8000 + doc_id % 8 * 1000) * (doc_id // 4 % 2 + 1) * 2)
        |             WHEN 3 THEN (doc_id * 31 % 100000) * 1000 // (600 + doc_id % 7 * 100)
        |             ELSE 0 END)::BIGINT AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin) { (spark, dir) =>
      MediaOps.extractMeta(MediaOps.mediaFromDocuments(spark, dir))
        .toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
          col("nBytes").as("n_bytes"), col("width"), col("height"),
          col("durationMs").as("duration_ms"))
        .orderBy(col("media_id"))
    },

    // REAL content features, fully oracle-gated: f1/f2 are the
    // header-parsed dimensions (normalized), f3..f8 are byte
    // statistics over the content stream AFTER the container header —
    // which is exactly the utf-8 text, so the oracle re-derives every
    // component from (doc_id, text) without ever seeing the payload.
    // LOAD-BEARING fixture invariant: the text is pure ASCII
    // (octet_length(encode(text)) = length(text) for every row, all
    // SFs — verified), so the oracle's per-CHARACTER ord/substr stats
    // equal Spark's per-BYTE stats; a non-ASCII fixture would need
    // the oracle rewritten over encode(text). Each feature is one
    // double expression rounded once to float on both sides (IEEE
    // round-to-nearest on both engines), re-widened to double for the
    // value compare; empty text yields 0 fractions on both sides
    // (Spark guards len == 0, the oracle CASE-guards the division).
    // Emitted as exploded scalar rows (the driver compare can't hash
    // array cells).
    QueryDef("q30_media_features",
      """WITH s AS (
        |  SELECT doc_id,
        |         CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |              WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS kind,
        |         CASE WHEN doc_id % 4 < 2 THEN doc_id * 7 % 1920 + 1 ELSE 0 END AS w,
        |         CASE WHEN doc_id % 4 < 2 THEN doc_id * 13 % 1080 + 1 ELSE 0 END AS h,
        |         length(text) AS len,
        |         list_aggregate([ord(substr(text, i, 1))
        |                         for i in generate_series(1, length(text))], 'sum') AS sbytes,
        |         length(text) - length(replace(text, ' ', '')) AS nws,
        |         length(regexp_replace(text, '[^a-z]', '', 'g')) AS nlower,
        |         length(regexp_replace(text, '[^0-9]', '', 'g')) AS ndigit,
        |         len(list_distinct([substr(text, i, 1)
        |                            for i in generate_series(1, length(text))])) AS ndist
        |  FROM documents),
        |fv AS (
        |  SELECT doc_id AS media_id, kind,
        |         [ w::DOUBLE / 1920.0, h::DOUBLE / 1080.0,
        |           len::DOUBLE / (len + 1024)::DOUBLE,
        |           CASE WHEN len = 0 THEN 0.0 ELSE sbytes::DOUBLE / (len * 255)::DOUBLE END,
        |           CASE WHEN len = 0 THEN 0.0 ELSE nws::DOUBLE / len::DOUBLE END,
        |           CASE WHEN len = 0 THEN 0.0 ELSE nlower::DOUBLE / len::DOUBLE END,
        |           CASE WHEN len = 0 THEN 0.0 ELSE ndigit::DOUBLE / len::DOUBLE END,
        |           CASE WHEN len = 0 THEN 0.0 ELSE ndist::DOUBLE / len::DOUBLE END ] AS f
        |  FROM s)
        |SELECT media_id, kind, i::BIGINT AS i,
        |       CAST(CAST(f[i] AS FLOAT) AS DOUBLE) AS fval
        |FROM fv CROSS JOIN generate_series(1, 8) t(i)
        |ORDER BY media_id, i""".stripMargin) { (spark, dir) =>
      MediaOps.extractFeatures(MediaOps.mediaFromDocuments(spark, dir))
        .toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
          posexplode(col("feature")).as(Seq("i0", "f")))
        .select(col("media_id"), col("kind"),
          (col("i0") + 1).cast("long").as("i"),
          col("f").cast("double").as("fval"))
        .orderBy(col("media_id"), col("i"))
    }
  )
}
