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
  * deliberately stays ROW-LOCAL instead of an explode + per-(doc,
  * gram) groupBy: documents are bounded (10^2 - 10^5 tokens) while
  * the corpus is not, so keeping repetition scoring inside the same
  * map stage as the rest of the quality rubric is the right side of
  * the bargain at 100 TB. The row-local count is O(n log n) — sort
  * the gram array once, take the longest equal-adjacent run — NOT the
  * naive O(distinct x total) rescan, which measured 26.8 s of a 39 s
  * pipeline on 10^5 documents (round-18). All signals are integer
  * counts; the threshold flags are integer-ratio comparisons (exact
  * arithmetic, stable oracle hashes).
  */
object RepetitionStats {

  /** Adjacent token 2-grams, NOT deduplicated (counts need
    * multiplicity); empty below 2 tokens. */
  def grams2(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Occurrence count of the most frequent 2-gram (0 if none):
    * sort the grams, then the answer is the longest run of equal
    * adjacent elements — one `aggregate` pass with (best, current)
    * run-length state. */
  def maxGram2Count(toks: Column): Column = {
    val g2 = grams2(toks)
    val sorted = array_sort(g2)
    // adjacent-equality mask of the sorted grams (n-1 booleans)
    val eqs = zip_with(
      slice(sorted, lit(1), size(sorted) - 1),
      slice(sorted, lit(2), size(sorted) - 1),
      (a, b) => a === b)
    val best = aggregate(
      eqs,
      struct(lit(1L).as("best"), lit(1L).as("cur")),
      (acc, eq) => {
        val cur = when(eq, acc.getField("cur") + 1L).otherwise(1L)
        struct(greatest(acc.getField("best"), cur).as("best"),
          cur.as("cur"))
      },
      acc => acc.getField("best"))
    when(size(g2) === 0, 0L).otherwise(best).cast("long")
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
