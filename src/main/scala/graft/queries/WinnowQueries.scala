package graft.queries

import graft.operators.Winnow
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Winnowing fingerprint gates (SURVEY §2.3 dedup/text-analysis
  * family): the MOSS content sketch ([[Winnow]]) and the
  * cross-document overlap report built on it. The oracle replays the
  * packed-key selection arithmetic exactly — every compared value is
  * a BIGINT (positions, 40-bit hashes, counts, hash checksums). */
object WinnowQueries {

  /** Hot-fingerprint document-frequency cap for the overlap join. */
  private val MaxDf = 10

  /** Minimum shared fingerprints for a reported pair. */
  private val MinShared = 2

  /** Shared oracle CTE chain mirroring [[Winnow.fingerprints]]:
    * 4-gram 40-bit md5-prefix hashes, the `h * 2^20 + (2^20-1-pos)`
    * packed key, window-min selection over W=5 complete windows
    * (short docs contribute their global min), and the shift/mask
    * unpack. */
  private val fpCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS p FROM documents),
       |g AS (
       |  SELECT doc_id, len(p) - 3 AS n,
       |         unnest([{'pos': i,
       |                  'h': ('0x' || substr(md5(p[i] || ' ' || p[i+1] || ' ' || p[i+2] || ' ' || p[i+3]), 1, 10))::BIGINT}
       |                 for i in generate_series(1, len(p) - 3)]) AS gr
       |  FROM toks WHERE len(p) >= 4),
       |k AS (
       |  SELECT doc_id, n, gr.pos AS pos,
       |         gr.h * 1048576 + (1048575 - gr.pos) AS ck FROM g),
       |sel AS (
       |  SELECT doc_id, n, pos,
       |         min(ck) OVER (PARTITION BY doc_id ORDER BY pos
       |                       ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS ckm
       |  FROM k),
       |fp AS (
       |  SELECT DISTINCT doc_id, 1048575 - (ckm % 1048576) AS pos,
       |                  ckm // 1048576 AS h
       |  FROM sel WHERE pos <= n - 4 OR (n < 5 AND pos = 1))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Per-document fingerprint sketch summary: gram count, selected
    // fingerprint count (density ≈ 2/(W+1) of grams), and the exact
    // integer checksum of selected hashes. Selection is map-only per
    // document; the only exchanges are the doc_id window partition and
    // the final per-doc agg that reuses it.
    QueryDef("q171_winnow_fingerprints",
      s"""WITH $fpCte,
         |ng AS (SELECT doc_id, min(n)::BIGINT AS n_grams FROM k GROUP BY doc_id),
         |ag AS (SELECT doc_id, count(*)::BIGINT AS n_fp, sum(h)::BIGINT AS fp_hsum
         |       FROM fp GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_fp, fp_hsum
         |FROM ng JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (spark, dir) =>
        val docs = Tables.loadParallel(spark, dir, "documents")
        val ng = Winnow.gramHashes(docs, "doc_id", "text")
          .groupBy(col("doc_id")).agg(min(col("n")).cast("long").as("n_grams"))
        val ag = Winnow.fingerprints(docs, "doc_id", "text")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_fp"), sum(col("h")).as("fp_hsum"))
        ng.join(ag, "doc_id")
          .select(col("doc_id"), col("n_grams"), col("n_fp"), col("fp_hsum"))
          .orderBy(col("doc_id"))
    },

    // MEMORIZATION / novelty audit: what fraction of each held-out
    // document's 4-grams already occurs in the training split —
    // the contamination-grain metric a pretraining pipeline reads
    // before trusting eval numbers (n-gram overlap is the standard
    // memorization screen). The train gram SET is distinct 40-bit
    // hashes (map-side-combined distinct, 8 bytes/gram on the
    // exchange); the audit is one left join on the hash key with a
    // per-doc integer rollup. Integers end to end.
    QueryDef("q177_gram_novelty",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS p FROM documents),
         |g AS (
         |  SELECT doc_id,
         |         unnest([('0x' || substr(md5(p[i] || ' ' || p[i+1] || ' ' || p[i+2] || ' ' || p[i+3]), 1, 10))::BIGINT
         |                 for i in generate_series(1, len(p) - 3)]) AS h
         |  FROM toks WHERE len(p) >= 4),
         |tr AS (SELECT DISTINCT h FROM g WHERE doc_id % 2 = 0),
         |held AS (SELECT doc_id, h FROM g WHERE doc_id % 2 = 1)
         |SELECT held.doc_id, count(*)::BIGINT AS n_grams,
         |       sum(CASE WHEN tr.h IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_seen
         |FROM held LEFT JOIN tr ON held.h = tr.h
         |GROUP BY held.doc_id ORDER BY held.doc_id""".stripMargin) {
      (spark, dir) =>
        val g = Winnow.gramHashes(
          Tables.loadParallel(spark, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("h"))
        val tr = g.where(col("doc_id") % 2 === 0).select(col("h")).distinct()
          .withColumn("seen", lit(1L))
        g.where(col("doc_id") % 2 === 1)
          .join(tr, Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("seen"), lit(0L))).as("n_seen"))
          .orderBy(col("doc_id"))
    },

    // Copy-detection overlap report: document pairs sharing >= 2
    // distinct fingerprint hashes after the df<=10 boilerplate cap.
    // Winnowing guarantees any shared run of W+K-1 = 8 tokens (the
    // SubstringDedup span grain) leaves at least one shared
    // fingerprint, so the planted duplicate spans must surface here.
    QueryDef("q172_winnow_overlap",
      s"""WITH $fpCte,
         |fpd AS (SELECT DISTINCT doc_id, h FROM fp),
         |dfk AS (SELECT h FROM (SELECT h, count(*) AS df FROM fpd GROUP BY h) z
         |        WHERE df <= $MaxDf),
         |kept AS (SELECT doc_id, h FROM fpd JOIN dfk USING (h))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       count(*)::BIGINT AS n_shared
         |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $MinShared
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      Winnow.overlap(Tables.loadParallel(spark, dir, "documents"), "doc_id", "text",
          minShared = MinShared, maxDf = MaxDf)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Copy CLUSTERS: the q172 overlap pairs closed into connected
    // components through the SAME log-round star-contraction
    // machinery the MinHash chain uses (clustersFromPairs) — a third
    // independent pair source composed with the shared CC operator,
    // labeling each involved document with its cluster's min id.
    QueryDef("q179_winnow_copy_clusters",
      s"""WITH RECURSIVE $fpCte,
         |fpd AS (SELECT DISTINCT doc_id, h FROM fp),
         |dfk AS (SELECT h FROM (SELECT h, count(*) AS df FROM fpd GROUP BY h) z
         |        WHERE df <= $MaxDf),
         |kept AS (SELECT doc_id, h FROM fpd JOIN dfk USING (h)),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2 HAVING count(*) >= $MinShared),
         |edges AS (SELECT doc_a AS id, doc_b AS nb FROM pr
         |          UNION ALL SELECT doc_b, doc_a FROM pr),
         |reach(id, r) AS (
         |  SELECT id, id FROM (SELECT DISTINCT id FROM edges) t
         |  UNION
         |  SELECT e2.id, reach.r FROM edges e2 JOIN reach ON e2.nb = reach.id)
         |SELECT id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY id
         |ORDER BY id""".stripMargin) { (spark, dir) =>
      NearDupQueries.clustersFromPairs(
          Winnow.overlap(Tables.loadParallel(spark, dir, "documents"), "doc_id",
            "text", minShared = MinShared, maxDf = MaxDf)
            .select(col("doc_a"), col("doc_b")))
        .orderBy(col("id"))
    }
  )
}
