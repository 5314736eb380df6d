package graft.operators

import graft.functions.TextSketches

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that overlap
  * an evaluation set by any exact token n-gram (the GPT-3/Llama-style
  * "13-gram collision" rule, n configurable). No reference
  * implementation; this is the LLM-data-pipeline operator that keeps
  * eval benchmarks out of the training corpus.
  *
  * Scale shape at 100 TB:
  *  - The EVAL side is small by construction (benchmarks are
  *    ~10^4-10^6 documents), so its distinct n-gram set is
  *    broadcastable — the training corpus is scanned ONCE, its
  *    n-grams tested per-row against the broadcast hash relation.
  *    Nothing shuffles the corpus.
  *  - The training side explodes to (doc_id, gram) only INSIDE the
  *    broadcast semi-join stage; survivors collapse back to distinct
  *    doc_ids immediately (the only exchange carries contaminated ids
  *    — a tiny fraction of the corpus).
  *  - The final removal is a broadcastable left-anti join on doc_id:
  *    contaminated ids are few, so the corpus again never shuffles.
  *  - N-grams are DISTINCT per document before the join
  *    ([[TextSketches.shingles]] dedups), bounding the explode at
  *    tokens-per-doc rows.
  */
object Decontaminate {

  /** Distinct doc_ids of `train` sharing at least one token n-gram
    * with `eval` (both need `idCol` + `textCol`). */
  def contaminatedIds(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = eval
      .select(explode(TextSketches.shingles(col(textCol), n)).as("g"))
      .distinct()
    train
      .select(col(idCol), explode(TextSketches.shingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** `train` minus every document contaminated against `eval`. */
  def clean(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    train.join(broadcast(contaminatedIds(train, eval, idCol, textCol, n)),
      Seq(idCol), "left_anti")

  /** Bloom-prefiltered contamination — the scale path when even the
    * eval set's distinct n-gram STRINGS are too wide to ship whole:
    * the grams collapse to `numBits` of bloom filter (ONE broadcast
    * row), the corpus's grams are probed in the SCAN STAGE (explode →
    * bloom filter, pipelined — the explode never reaches an
    * exchange; only bloom-hit doc ids do, a tiny fraction bounded by
    * contamination + the false-positive rate), and only those
    * candidates pay the exact gram semi-join that removes bloom false
    * positives. No false negatives by construction, so the result
    * EQUALS [[contaminatedIds]] (plus any extra columns in `keep`) —
    * the q69 bloom-semi-join argument applied to decontamination.
    *
    * Probe shape notes (both measured at sf0.1):
    *  - an `exists()` HOF over the gram array would short-circuit at
    *    the first hit, but higher-order lambdas run INTERPRETED; the
    *    exploded form keeps the whole probe inside codegen.
    *  - the filter must reach the probe as a LITERAL, not a column: a
    *    BINARY column read out of the (cross-joined) bloom row copies
    *    all bits/8 bytes PER PROBED GRAM (`getBinary` allocates), and
    *    at megabit filter sizes that per-row copy dwarfs the probe
    *    itself. A literal is a codegen reference object — read once.
    *    The one driver-side `head()` materializes bits/8 bytes of
    *    planning metadata, sized by the EVAL corpus — the BloomSkip
    *    discipline, and exactly how Spark's own runtime-filter
    *    `BloomFilterMightContain` ships its filter (scalar subquery
    *    materialized before the probe stage). 14.5s → ~1s at sf0.1. */
  def bloomContaminatedIds(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      numBits: Int, numHashes: Int, keep: Seq[String] = Nil): DataFrame = {
    val evalGrams = eval
      .select(explode(TextSketches.shingles(col(textCol), n)).as("g"))
      .distinct()
    val bf = lit(evalGrams.agg(graft.functions.GraftFunctions
      .bloom_agg(xxhash64(col("g")), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0))
    val hitIds = train
      .select(col(idCol),
        explode(TextSketches.shingles(col(textCol), n)).as("g"))
      .where(graft.functions.GraftFunctions
        .bloom_might_contain(bf, xxhash64(col("g")), numHashes))
      .select(col(idCol)).distinct()
    val cand = train
      .select((idCol +: keep).map(col) :+ col(textCol): _*)
      .join(broadcast(hitIds), Seq(idCol), "left_semi")
    cand.select((idCol +: keep).map(col) :+
        explode(TextSketches.shingles(col(textCol), n)).as("g"): _*)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select((idCol +: keep).map(col): _*)
      .distinct()
  }
}
