package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring deduplication (Lee et al., 2022,
  * arXiv:2107.06499): remove every token span of length >= k that
  * occurs anywhere else in the corpus, keeping exactly the FIRST
  * occurrence (minimum (doc_id, position)). The canonical use: strip
  * boilerplate and cross-document quotations that whole-document or
  * near-dup passes can't see. No reference implementation;
  * driver-mandated dedup-family operator.
  *
  * Algorithm (the distributed re-expression of the paper's
  * suffix-array pass):
  *  1. every k-gram occurrence (doc_id, pos, gram) — map-only explode;
  *  2. per gram: occurrence count + minimum occurrence key — ONE
  *     map-side-combined aggregation (count and min both partial-agg);
  *  3. non-canonical occurrences of duplicated grams = removal starts
  *     — an equi-join of occurrences against the (much smaller)
  *     duplicated-gram set;
  *  4. removal starts collapse to a per-doc start list (bounded by the
  *     doc's token count), which joins BACK to the corpus broadcast
  *     (affected docs are a fraction) — coverage and reassembly are
  *     then ROW-LOCAL higher-order functions: token i survives iff no
  *     start s has s <= i < s+k. No token-level shuffle anywhere.
  *
  * At 100 TB the gram shuffle dominates; the production lever is
  * `hashGrams = true`: grams collapse to 64-bit `xxhash64` keys
  * MAP-SIDE, so the exchange carries 8 bytes per occurrence instead
  * of the k-token text (~100+ bytes at k=10) — a ~10x shuffle-byte
  * cut, trading a ~n²/2⁶⁴ false-merge rate (two distinct grams
  * colliding would remove a span that wasn't duplicated; at 10¹²
  * grams that is ~3·10⁻⁵ expected false spans corpus-wide). Exact
  * text never rides the gram exchange in that mode — it is only
  * rejoined doc-locally for the removal-list reassembly, which keys
  * on (doc_id, pos) alone. Occurrence keys encode as
  * doc_id * PosBase + pos, which bounds supported documents at PosBase
  * tokens (far above any training document; chunk longer inputs).
  */
object SubstringDedup {

  /** Max tokens per document under the integer occurrence-key
    * encoding (same constant inlined in the oracle SQL). */
  val PosBase = 1000000L

  /** (doc_id, pos, g): every k-gram occurrence, 1-based positions.
    *
    * Two planner traps shape this code, both measured at ~10-20x the
    * whole pipeline's cost when tripped:
    *  - the token array is materialized in its OWN projection:
    *    referencing `split(text)` directly inside the gram lambda
    *    re-splits the text on every element_at lookup;
    *  - the explode is `explode_outer` + a null filter, NOT plain
    *    `explode`: InferFiltersFromGenerate infers `size(oc) > 0` for
    *    an inner explode and predicate pushdown sinks that filter
    *    BELOW the token projection, where the entire gram-array
    *    expression is re-evaluated per row with `split(text)` inlined
    *    under every element_at (O(tokens·k) splits per gram). The
    *    rule skips outer generates, so the guard never materializes
    *    and empty-array rows cost one null row each instead. */
  def occurrences(docs: DataFrame, idCol: String, textCol: String,
      k: Int, hashGrams: Boolean = false): DataFrame = {
    val toks = col("_toks")
    // hashGrams collapses the gram to its xxhash64 INSIDE the per-row
    // transform — the full text of a gram never leaves the map task
    def gram(i: Column): Column = {
      val text =
        concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*)
      if (hashGrams) xxhash64(text) else text
    }
    val elemType =
      if (hashGrams) "array<struct<pos:int,g:bigint>>"
      else "array<struct<pos:int,g:string>>"
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"),
        when(size(toks) >= k,
          transform(sequence(lit(1), size(toks) - (k - 1)),
            i => struct(i.as("pos"), gram(i).as("g"))))
          .otherwise(array().cast(elemType)).as("oc"))
      .select(col("doc_id"), explode_outer(col("oc")).as("o"))
      .where(col("o").isNotNull)
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.g").as("g"))
  }

  private def occKey(doc: Column, pos: Column): Column =
    doc * PosBase + pos.cast("long")

  /** Removal starts: (doc_id, pos) of every NON-canonical occurrence
    * of a gram that occurs more than once corpus-wide. */
  def removalStarts(docs: DataFrame, idCol: String, textCol: String,
      k: Int, hashGrams: Boolean = false): DataFrame = {
    val occ = occurrences(docs, idCol, textCol, k, hashGrams)
    val dup = occ.groupBy(col("g"))
      .agg(count(lit(1)).as("c"), min(occKey(col("doc_id"), col("pos"))).as("canon"))
      .where(col("c") > 1)
      .select(col("g"), col("canon"))
    occ.join(dup, Seq("g"))
      .where(occKey(col("doc_id"), col("pos")) =!= col("canon"))
      .select(col("doc_id"), col("pos"))
  }

  /** The corpus with duplicated spans cut: adds `kept_text` (first
    * occurrences keep their text verbatim; non-canonical spans are
    * removed token-wise) and `n_kept`. Unaffected docs pass through
    * with their full text. */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      k: Int, hashGrams: Boolean = false): DataFrame =
    scrubWithStarts(docs, removalStarts(docs, idCol, textCol, k, hashGrams),
      idCol, textCol, k)

  /** [[scrub]] over PRECOMPUTED removal starts — callers that also
    * need the start set for other purposes (the q129 gate derives its
    * affected-doc filter from it) materialize `removalStarts` once
    * and pass it here, instead of paying the occurrence explode and
    * gram aggregation twice. */
  def scrubWithStarts(docs: DataFrame, removalStarts: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val starts = removalStarts
      .groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("starts"))
    val toks = col("_toks")
    docs
      .join(broadcast(starts), docs(idCol) === starts("doc_id"), "left")
      .drop(starts("doc_id"))
      .withColumn("_toks", split(col(textCol), " ")) // hoisted once (see occurrences)
      .withColumn("_kept",
        when(col("starts").isNull, toks).otherwise(
          // row-local coverage: token i survives iff no start covers it
          transform(
            filter(sequence(lit(1), size(toks)),
              i => !exists(col("starts"), s => s <= i && i < s + k)),
            i => element_at(toks, i))))
      .withColumn("kept_text", concat_ws(" ", col("_kept")))
      .withColumn("n_kept", size(col("_kept")).cast("long"))
      .drop("_toks", "_kept", "starts")
  }
}
