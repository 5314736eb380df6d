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
      Tables.loadParallel(spark, dir, "documents")
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
      Tables.loadParallel(spark, dir, "documents")
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
      val docs = Tables.loadParallel(spark, dir, "documents")
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
    },

    // RECORD LINKAGE / entity resolution: match a "dirty" external
    // record set back to the master table through blocking + fuzzy
    // verify — the cross-SOURCE sibling of near-dup (one record per
    // entity, typos included). The dirty side is derived in-query,
    // deterministically in both engines: each customer's name gets an
    // md5-chosen edit (delete / substitute a serial digit at position
    // 11-18, or kept verbatim). The pipeline is the scale-canonical
    // shape: candidates come ONLY from an equi-join on the blocking
    // key (nation, name-prefix-10 — untouched by the edits), never a
    // cross join; levenshtein ≤ 1 verifies inside blocks; one
    // window picks each dirty record's best master (min distance,
    // lowest key). The audit reports, per nation: dirty records,
    // matched, matched-to-the-TRUE-entity, exact and fuzzy counts —
    // n_correct < n_matched exposes real serial-collision traps.
    QueryDef("q282_record_linkage",
      """WITH crm AS (
        |  SELECT c_custkey AS crm_id, c_nationkey,
        |         CAST(('0x' || substr(md5('rl:' || CAST(c_custkey AS VARCHAR)), 1, 7)) AS BIGINT) AS h,
        |         c_name
        |  FROM customer),
        |dirty AS (
        |  SELECT crm_id, c_nationkey,
        |         CASE h % 3
        |           WHEN 0 THEN substr(c_name, 1, 10 + (h // 3) % 8) || substr(c_name, 12 + (h // 3) % 8)
        |           WHEN 1 THEN substr(c_name, 1, 10 + (h // 3) % 8) || 'x' || substr(c_name, 12 + (h // 3) % 8)
        |           ELSE c_name END AS dname
        |  FROM crm),
        |cand AS (
        |  SELECT d.crm_id, d.c_nationkey, c.c_custkey,
        |         levenshtein(d.dname, c.c_name) AS lev
        |  FROM dirty d JOIN customer c
        |    ON d.c_nationkey = c.c_nationkey
        |   AND substr(d.dname, 1, 10) = substr(c.c_name, 1, 10)),
        |best AS (
        |  SELECT crm_id, c_nationkey, c_custkey, lev FROM (
        |    SELECT crm_id, c_nationkey, c_custkey, lev,
        |           row_number() OVER (PARTITION BY crm_id ORDER BY lev, c_custkey) AS rn
        |    FROM cand WHERE lev <= 1) t
        |  WHERE rn = 1)
        |SELECT CAST(d.c_nationkey AS BIGINT) AS nation,
        |       CAST(count(*) AS BIGINT) AS n_crm,
        |       CAST(sum(CASE WHEN b.crm_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |       CAST(sum(CASE WHEN b.c_custkey = d.crm_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |       CAST(sum(CASE WHEN b.lev = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |       CAST(sum(CASE WHEN b.lev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_fuzzy
        |FROM dirty d LEFT JOIN best b ON b.crm_id = d.crm_id
        |GROUP BY d.c_nationkey ORDER BY nation""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cust = Tables.load(spark, dir, "customer")
      val h = conv(substring(md5(concat(lit("rl:"),
        col("c_custkey").cast("string"))), 1, 7), 16, 10).cast("long")
      val p8 = expr("h DIV 3") % 8
      val prefix = col("c_name").substr(lit(1), lit(10) + p8)
      val suffix = col("c_name").substr(lit(12) + p8, lit(18))
      val dirty = cust
        .select(col("c_custkey").as("crm_id"), col("c_nationkey"),
          col("c_name"), h.as("h"))
        .select(col("crm_id"), col("c_nationkey"),
          when(col("h") % 3 === 0, concat(prefix, suffix))
            .when(col("h") % 3 === 1, concat(prefix, lit("x"), suffix))
            .otherwise(col("c_name")).as("dname"))
      val cand = dirty.as("d").join(cust.as("m"),
        col("d.c_nationkey") === col("m.c_nationkey") &&
          substring(col("d.dname"), 1, 10) === substring(col("m.c_name"), 1, 10))
        .select(col("d.crm_id").as("crm_id"),
          col("d.c_nationkey").as("c_nationkey"),
          col("m.c_custkey").as("c_custkey"),
          levenshtein(col("d.dname"), col("m.c_name")).as("lev"))
      val w = Window.partitionBy(col("crm_id"))
        .orderBy(col("lev"), col("c_custkey"))
      val best = cand.where(col("lev") <= 1)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("crm_id"), col("c_custkey"), col("lev"))
      dirty.join(best, Seq("crm_id"), "left")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_crm"),
          sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          sum(when(col("c_custkey") === col("crm_id"), 1L).otherwise(0L)).as("n_correct"),
          sum(when(col("lev") === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("lev") === 1, 1L).otherwise(0L)).as("n_fuzzy"))
        .select(col("c_nationkey").cast("long").as("nation"), col("n_crm"),
          col("n_matched"), col("n_correct"), col("n_exact"), col("n_fuzzy"))
        .orderBy(col("nation"))
    }
  )
}
