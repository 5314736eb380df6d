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
    }
  )
}
