package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD —
  * the MOSS algorithm). Selects, from each window of [[W]] consecutive
  * k-gram hashes, the minimum hash (rightmost on ties), guaranteeing
  * any shared substring of at least W + K - 1 tokens contributes at
  * least one shared fingerprint while keeping density at 2/(W+1).
  * Complements the exact-span dedup in [[SubstringDedup]] (which
  * finds and removes every duplicated k-gram span) with a sublinear
  * SKETCH of document content for copy DETECTION — the
  * plagiarism/citation-analysis side of a corpus pipeline. No
  * reference implementation (the reference ships only the median
  * UDA); driver-mandated LLM-pipeline extension.
  *
  * Design for 100 TB:
  *
  *  - **Map-only selection.** Gram hashing and window-min selection
  *    are per-document: one projection + one window function over the
  *    document's own positions (the exchange partitions by doc_id,
  *    which the downstream distinct reuses). No corpus-wide state.
  *  - **Single-BIGINT window key.** The rightmost-argmin rule packs
  *    into one comparable integer: `ck = h * 2^20 + (2^20 - 1 - pos)`
  *    (40-bit hash, 20-bit position). A plain `min(ck)` over the
  *    W-row frame IS the tie-broken selection — no struct ordering,
  *    no second pass, and the identical arithmetic replays in any
  *    SQL engine. Positions are capped at 2^20 tokens per document
  *    (validated by spec; longer docs should be chunked upstream with
  *    q138's splitter first).
  *  - **40-bit hashes.** MOSS itself runs on 32-bit hashes; 40 keeps
  *    the false-sharing rate negligible at corpus scale while leaving
  *    20 bits of the packed key for the position.
  *  - **Hot-fingerprint cap.** Overlap detection drops fingerprints
  *    shared by more than `maxDf` documents before the self-join —
  *    boilerplate grams otherwise create quadratic candidate pairs
  *    (the same degenerate-bucket guard the MinHash band join uses).
  */
object Winnow {

  /** Tokens per k-gram. */
  val K = 4

  /** Window length in grams: any match of W + K - 1 = 8 tokens is
    * guaranteed a shared fingerprint — aligned with
    * [[SubstringDedup]]'s 8-token span grain. */
  val W = 5

  /** Position bits in the packed selection key. */
  val PosBits = 20
  val PosCap: Long = (1L << PosBits) - 1

  /** (doc_id, pos, h, n) gram-hash positions: h is the 40-bit md5
    * prefix of the K-token gram at pos (1-based), n the gram count of
    * the document. The token array is hoisted to its own projection
    * and the explode is outer + null-filtered (the
    * InferFiltersFromGenerate planner lesson from [[SubstringDedup]]). */
  def gramHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("_toks")
    docs
      .select(col(idCol), split(col(textCol), " ").as("_toks"))
      .select(col(idCol), (size(t) - (K - 1)).as("n"),
        explode_outer(when(size(t) >= K,
          transform(sequence(lit(1), greatest(size(t) - (K - 1), lit(1))),
            i => struct(i.as("pos"),
              conv(substring(md5(concat_ws(" ",
                (0 until K).map(j => element_at(t, i + j)): _*)), 1, 10),
                16, 10).cast("long").as("h"))))).as("_g"))
      .where(col("_g").isNotNull)
      .select(col(idCol), col("_g.pos").as("pos"), col("_g.h").as("h"),
        col("n"))
  }

  /** Selected fingerprints (doc_id, pos, h): the rightmost minimum of
    * every complete W-gram window (documents with fewer than W grams
    * contribute their single global minimum). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = gramHashes(docs, idCol, textCol)
      .select(col(idCol), col("pos"), col("n"),
        (shiftleft(col("h"), PosBits) + (lit(PosCap) - col("pos"))).as("ck"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, W - 1)
    g.select(col(idCol), col("pos"), col("n"), min(col("ck")).over(w).as("ckm"))
      .where(col("pos") <= col("n") - (W - 1) ||
        (col("n") < W && col("pos") === 1))
      // unpack with shifts/masks — `/` on longs would be DOUBLE
      // division and lose low bits above 2^53
      .select(col(idCol),
        (lit(PosCap) - col("ckm").bitwiseAND(PosCap)).cast("long").as("pos"),
        shiftright(col("ckm"), PosBits).cast("long").as("h"))
      .distinct()
  }

  /** Packed gram-key array for one document — the md5-heavy half of
    * the per-row selection. MUST be materialized to its own projected
    * column before the window reduction runs over it: a higher-order
    * lambda referencing this expression directly would re-evaluate
    * the ENTIRE array per window start (no CSE inside interpreted
    * HOFs — the PqIndex/SubstringDedup planner lesson; measured as a
    * hang at corpus scale before the split). */
  private def ckKeys(text: Column): Column = {
    val t = split(text, " ")
    val n = size(t) - (K - 1)
    // the n >= 1 guard must live HERE: projected unconditionally, a
    // short document would otherwise evaluate element_at out of range
    when(n >= 1,
      transform(sequence(lit(1), greatest(n, lit(1))), i =>
        shiftleft(conv(substring(md5(concat_ws(" ",
          (0 until K).map(j => element_at(t, i + j)): _*)), 1, 10), 16, 10)
          .cast("long"), PosBits) + (lit(PosCap) - i)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Window reduction over an ALREADY-PROJECTED ck array column:
    * each complete window collapses with `array_min` over a `slice`,
    * duplicates with `array_distinct`. */
  private def winnowCk(ck: Column, nToks: Column): Column = {
    val n = nToks - (K - 1)
    val starts = when(n >= W, sequence(lit(1), n - (W - 1)))
      .otherwise(sequence(lit(1), lit(1)))
    when(n >= 1,
      array_distinct(transform(starts, s => array_min(slice(ck, s, lit(W))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** The whole selection as per-row array expressions — no explode,
    * no window function, no shuffle — split across TWO projections so
    * the md5 gram-key array evaluates once per row (see [[ckKeys]]).
    * Being per-row it runs UNCHANGED under Structured Streaming
    * (fingerprints computed in-flight at ingest, zero streaming
    * state — the [[graft.streaming.DocStreams]] sketch-at-ingest
    * pattern), and in batch it keeps selection inside the scan
    * stage. Output: (idCol, fp_keys) with the distinct packed keys
    * (unpack: h = ck >> 20, pos = 2^20-1 - (ck & mask)). */
  def withFingerprintKeys(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), ckKeys(col(textCol)).as("_ck"),
        size(split(col(textCol), " ")).as("_nt"))
      .select(col(idCol), winnowCk(col("_ck"), col("_nt")).as("fp_keys"))

  /** Cross-document overlap report: pairs sharing at least
    * `minShared` distinct fingerprint hashes, after dropping hashes
    * present in more than `maxDf` documents (boilerplate guard — the
    * join would otherwise be quadratic in the hottest hash).
    * Batch selection deliberately uses the WINDOW form: the doc_id
    * exchange + codegen'd window `min` measured ~6× faster than the
    * per-row array form at sf0.01 (interpreted `slice`/`array_min`
    * per window start dominates); [[withFingerprintKeys]] remains the
    * streaming-ingest path, where a window function is unavailable. */
  def overlap(docs: DataFrame, idCol: String, textCol: String,
      minShared: Int, maxDf: Int): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
      .select(col(idCol), col("h")).distinct()
    val df = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val kept = fp.join(df, "h")
    kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
