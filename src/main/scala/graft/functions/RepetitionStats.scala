package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al., 2021,
  * arXiv:2112.11446 §A1.1): the fraction of duplicated tokens and the
  * share of the most-repeated 2-gram, per document. No reference
  * implementation; driver-mandated text-quality operator.
  *
  * Everything here is a higher-order-function expression over the
  * token array — per-row, zero shuffle, no UDF. The top-2-gram count
  * deliberately stays a ROW-LOCAL O(distinct x total) scan instead of
  * an explode + per-(doc, gram) groupBy: documents are bounded (10^2 -
  * 10^5 tokens) while the corpus is not, so trading a bounded per-row
  * loop for a corpus-wide exchange is the right side of the bargain at
  * 100 TB — repetition scoring stays inside the same map stage as the
  * rest of the quality rubric. All signals are integer counts; the
  * threshold flags are integer-ratio comparisons (exact arithmetic,
  * stable oracle hashes).
  */
object RepetitionStats {

  /** Adjacent token 2-grams, NOT deduplicated (counts need
    * multiplicity); empty below 2 tokens. */
  def grams2(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Occurrence count of the most frequent 2-gram (0 if none). */
  def maxGram2Count(toks: Column): Column = {
    val g2 = grams2(toks)
    coalesce(
      array_max(transform(array_distinct(g2),
        x => size(filter(g2, y => y === x)))),
      lit(0)).cast("long")
  }

  /** Duplicated-token flag: at least `pct`% of tokens are repeats
    * (n_tok - n_distinct >= pct% of n_tok), integer arithmetic. */
  def dupTokenFlag(toks: Column, pct: Int): Column =
    (size(toks) - size(array_distinct(toks))).cast("long") * 100 >=
      size(toks).cast("long") * pct

  /** Top-2-gram flag: the most frequent 2-gram covers at least `pct`%
    * of all 2-grams. */
  def topGram2Flag(toks: Column, pct: Int): Column =
    maxGram2Count(toks) * 100 >= size(grams2(toks)).cast("long") * pct
}
