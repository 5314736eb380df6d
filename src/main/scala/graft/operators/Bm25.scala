package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a tokenized corpus — the ranked
  * keyword-search pass a curation pipeline runs to pull topical
  * slices out of a crawl (and the scoring half of an inverted
  * index). No reference implementation; driver-mandated text-family
  * extension beside TF-IDF (q53).
  *
  * Scoring uses the odds form of the BM25 idf,
  * `(N - df + 0.5) / (df + 0.5)`, instead of its logarithm: per-term
  * ranking is identical (log is monotone) and — unlike `ln`, whose
  * last-ulp rounding is libm-specific — every operation here
  * (+, *, /) is IEEE-754 exactly-rounded, so an ANSI engine replays
  * the score BIT-FOR-BIT. The per-document score sums its per-term
  * scores in fixed query-term order (conditional aggregation, never
  * a float `sum()` whose partition order would be nondeterministic).
  *
  * Scale shape at 100 TB:
  *  - The postings explode is filtered to the |Q| query terms BEFORE
  *    the tf aggregation, so the only corpus-wide exchange carries
  *    one row per (matching doc, query term) — O(selectivity), not
  *    O(tokens).
  *  - df (|Q| rows) and the corpus scalars (1 row) join back by
  *    broadcast; nothing else shuffles.
  *  - Top-k is `ORDER BY … LIMIT k` → TakeOrderedAndProject: each
  *    partition keeps a k-row heap, the driver merges k·p rows —
  *    no global sort.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-k BM25 over `docs(idCol, tokensCol)` for `terms`.
    * Documents containing none of the terms score 0 and are not
    * returned. Output: (idCol, score), the k highest scores,
    * score-then-id ordered. */
  def search(docs: DataFrame, idCol: String, tokensCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
    val id = col(idCol)
    val stats = docs.select(id, size(col(tokensCol)).cast("long").as("dl"),
      col(tokensCol).as("t"))

    // one row per (doc, query term) with its tf — the term filter
    // sits under the aggregation, so non-matching tokens never reach
    // the exchange
    val postings = stats
      .select(id, col("dl"), explode(col("t")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(id, col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // document frequency per query term: one row per term already,
    // so a plain count — |Q| rows, broadcast back
    val dfs = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // corpus scalars (N, total token count) — 1 row, broadcast
    val scalars = stats.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("dl_sum"))

    val avgdl = col("dl_sum").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl)
    val s = idf * (col("tf") * lit(K1 + 1.0)) / norm

    val scored = postings
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(scalars))
      .select(id, col("term"), s.as("s"))

    // fixed-order per-document sum: one conditional-max column per
    // query term, added left-to-right — deterministic regardless of
    // partitioning (a float sum() would not be)
    val termCols = terms.map(t =>
      coalesce(max(when(col("term") === t, col("s"))), lit(0.0)))
    scored.groupBy(id)
      .agg(termCols.reduceLeft(_ + _).as("score"))
      .orderBy(col("score").desc, id)
      .limit(k)
  }
}
