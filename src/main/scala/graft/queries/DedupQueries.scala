package graft.queries

import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Exact deduplication over the `documents` table (SURVEY §2.3) — the
  * most common LLM-pipeline operation. No reference implementation
  * exists; driver-mandated extension.
  *
  * Design for 100 TB: dedup keys on a fixed-width content fingerprint
  * (`sha2(text, 256)`), NOT on the raw text — the shuffle then moves
  * 32-byte keys instead of multi-KB documents, and the groupBy is a
  * standard partial+final hash aggregation (map-side combine shrinks
  * each partition to its distinct fingerprints before the exchange).
  * Collision probability at 100 TB (~1e10 docs) is ~1e-57; an exact
  * engine that cannot tolerate that would add a within-bucket text
  * equality check after a fingerprint pre-join, same plan shape.
  */
object DedupQueries {

  val defs: Seq[QueryDef] = Seq(

    // One surviving doc per distinct content fingerprint (keep lowest
    // doc_id), plus the duplicate count — the audit view of a dedup.
    QueryDef("q17_dedup_exact",
      """SELECT min(doc_id) AS keep_id,
        |       sha256(text) AS fp,
        |       count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("fp"), col("n_copies"))
        .orderBy(col("keep_id"))
    },

    // Normalization-aware dedup: case-fold, strip punctuation,
    // collapse whitespace BEFORE fingerprinting — catches the trivial
    // reformattings exact dedup misses while keeping the same
    // 32-byte-key shuffle shape. (Spark's regexp_replace is global by
    // default; DuckDB needs the 'g' flag.)
    QueryDef("q54_dedup_normalized",
      """SELECT min(doc_id) AS keep_id,
        |       sha256(trim(regexp_replace(regexp_replace(lower(text),
        |         '[.,!?;:]', '', 'g'), ' +', ' ', 'g'))) AS fp,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 2 ORDER BY keep_id""".stripMargin) { (spark, dir) =>
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[.,!?;:]", ""), " +", " "))
      Tables.load(spark, dir, "documents")
        .groupBy(sha2(norm, 256).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("fp"), col("n_copies"))
        .orderBy(col("keep_id"))
    },

    // Incremental dedup — the shape every ingestion pipeline actually
    // runs: a new batch (doc_id >= 400) checked against the historical
    // corpus's fingerprint set with a LEFT ANTI join on the 32-byte
    // key. At 100 TB the history side is a compact fingerprint store,
    // not the documents.
    QueryDef("q58_incremental_dedup",
      """WITH hist AS (
        |  SELECT DISTINCT sha256(text) AS fp FROM documents WHERE doc_id < 400),
        |newb AS (
        |  SELECT doc_id, sha256(text) AS fp FROM documents WHERE doc_id >= 400)
        |SELECT n.doc_id FROM newb n LEFT JOIN hist h ON n.fp = h.fp
        |WHERE h.fp IS NULL ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val hist = docs.where(col("doc_id") < 400)
        .select(sha2(col("text"), 256).as("fp")).distinct()
      docs.where(col("doc_id") >= 400)
        .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
        .join(hist, Seq("fp"), "left_anti")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // Cardinality sketch (HyperLogLog++ via approx_count_distinct):
    // the count-distinct that still works when the key set itself
    // cannot fit anywhere. The sketch is deterministic (hash-based),
    // so like q24 the gate emits a deterministic error-bound boolean
    // next to the exact count the oracle can state directly. Margin:
    // default rsd is 5% (1 sigma), so the 20% bound is 4 sigma —
    // dataset-dependent HLL error at an untested scale factor must
    // not be able to flip the gate.
    QueryDef("q55_approx_distinct",
      """SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS n_exact, true AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey")).as("n_appx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_appx") - col("n_exact")) * 5 <= col("n_exact")).as("ok"))
        .orderBy(col("l_returnflag"))
    }
  )
}
