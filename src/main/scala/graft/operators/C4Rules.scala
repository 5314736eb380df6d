package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020, "Exploring
  * the Limits of Transfer Learning with a Unified Text-to-Text
  * Transformer", JMLR §2.2 — the cleaning recipe behind the C4
  * pretraining corpus). No reference implementation (the reference
  * ships only the median UDA); this is a driver-mandated LLM-pipeline
  * extension.
  *
  * The recipe has two grains, and keeping them straight is what makes
  * it scale:
  *
  *  - **Document-level drops** (boilerplate/code markers — "lorem
  *    ipsum", curly brace): a codegen'd `contains` over the raw text.
  *  - **Line-level retention** (terminal punctuation, minimum word
  *    count, javascript-warning lines): expressed with Spark's
  *    higher-order array functions (`split` → `filter` → `size` /
  *    `array_join`), so the whole per-document rewrite is ONE
  *    map-only projection — ZERO shuffles, no explode/re-group round
  *    trip. At 100 TB the naive shape (explode to (doc_id, line),
  *    filter, groupBy doc_id to reassemble) pays a full-corpus
  *    exchange on the widest possible frame; the higher-order form
  *    pays nothing and stays inside whole-stage codegen.
  *  - **Minimum-sentence drop** (a document must keep at least
  *    `minLines` surviving lines): a `size(...)` test on the same
  *    in-row array.
  */
object C4Rules {

  /** C4 defaults: a retained line ends in terminal punctuation and
    * has at least 4 words (the paper uses 5-word / 3-sentence English
    * thresholds; the fixture's synthetic lines are shorter). */
  val MinWords = 4
  val MinLines = 2

  /** Document-level drop: code/boilerplate markers anywhere in the
    * raw text (C4 drops pages containing `{` or "lorem ipsum"). */
  def docBad(text: Column): Column =
    text.contains("lorem ipsum") || text.contains("{")

  /** Surviving lines of `text`: terminal '.', >= `minWords`
    * whitespace words, and no javascript warning — a single
    * higher-order `filter`, no explode. */
  def keptLines(text: Column, minWords: Int): Column =
    filter(split(text, "\n"), l =>
      l.endsWith(".") && size(split(l, " ")) >= minWords &&
        !l.contains("javascript"))

  /** Cleaned text: surviving lines re-joined. Callers should drop the
    * document when `size(keptLines(...)) < minLines`. */
  def cleaned(kept: Column): Column = array_join(kept, "\n")
}
