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
    requireTerms(terms)
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

    scoreTopK(postings, dfs, scalars, terms, k, idCol)
  }

  /** The per-(doc, term) BM25 score expression over a joined
    * (postings ⋈ dfs ⋈ scalars) row — one shared definition so every
    * path produces bit-identical doubles. */
  private def scoreExpr: Column = {
    val avgdl = col("dl_sum").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl)
    idf * (col("tf") * lit(K1 + 1.0)) / norm
  }

  /** [[search]] with each per-term score quantized to micro-units
    * BEFORE the per-document sum: the aggregation becomes exact
    * integer arithmetic, order-free under ANY term set — which is
    * what a DYNAMIC query (e.g. pseudo-relevance-feedback expansion)
    * needs, where the fixed-order conditional-column trick of
    * [[search]] is unavailable because the terms are data-dependent.
    * Output: (idCol, score_micro). */
  def searchMicro(docs: DataFrame, idCol: String, tokensCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    requireTerms(terms)
    val id = col(idCol)
    val stats = docs.select(id, size(col(tokensCol)).cast("long").as("dl"),
      col(tokensCol).as("t"))
    val postings = stats
      .select(id, col("dl"), explode(col("t")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(id, col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scalars = stats.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("dl_sum"))
    postings.join(broadcast(dfs), "term").crossJoin(broadcast(scalars))
      .select(id, round(scoreExpr * lit(1000000.0)).cast("long").as("sm"))
      .groupBy(id).agg(sum(col("sm")).as("score_micro"))
      .orderBy(col("score_micro").desc, id)
      .limit(k)
  }

  /** The scoring tail shared by the corpus path ([[search]]) and the
    * index-served path ([[searchIndex]]): identical Column
    * expressions, so the two paths produce BIT-IDENTICAL scores —
    * the serve gate's oracle can simply replay the corpus form. */
  private def scoreTopK(post: DataFrame, dfs: DataFrame, scalars: DataFrame,
      terms: Seq[String], k: Int, idCol: String): DataFrame = {
    val id = col(idCol)
    val s = scoreExpr

    val scored = post
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

  // ---- persisted-index lifecycle ---------------------------------------

  /** The inverted-index ARTIFACT [[searchIndex]] probes: doc-
    * partitioned posting blocks `(term, block, n_docs, sum_tf,
    * postings)` where `block = doc_id div blockSize` and `postings`
    * is the comma-joined `doc:tf:dl` entries sorted by doc id.
    *
    * Two deliberate shapes for 100 TB:
    *  - Blocking bounds per-group state at O(blockSize) no matter how
    *    hot a term is (an unblocked stopword posting list would
    *    exceed executor memory), and the block key doubles as the
    *    shard-pruning key.
    *  - The entry carries the document length, so SERVING reads only
    *    the matched postings plus the 1-row scalars — never a
    *    corpus-sized norms table. Denormalizing dl costs ~4 bytes per
    *    posting; re-reading the corpus per query at serve time costs
    *    everything.
    */
  def buildIndex(docs: DataFrame, idCol: String, tokensCol: String,
      blockSize: Int): DataFrame = {
    val stats = docs.select(col(idCol).as("doc_id"),
      size(col(tokensCol)).cast("long").as("dl"), col(tokensCol).as("t"))
    stats.select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("block", floor(col("doc_id") / blockSize).cast("long"))
      .groupBy(col("term"), col("block"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tf")).as("sum_tf"),
        array_join(transform(
          sort_array(collect_list(struct(col("doc_id"), col("tf"), col("dl")))),
          e => concat(e.getField("doc_id").cast("string"), lit(":"),
            e.getField("tf").cast("string"), lit(":"),
            e.getField("dl").cast("string"))), ",").as("postings"))
  }

  /** The index's 1-row metadata artifact: corpus size + total token
    * count — the BM25 global scalars a serving node holds in memory. */
  def corpusScalars(docs: DataFrame, idCol: String, tokensCol: String): DataFrame =
    docs.select(col(idCol), size(col(tokensCol)).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("dl_sum"))

  /** Top-k BM25 served from the persisted index alone: the `term IN`
    * filter pushes into the artifact's parquet scan, df per term is
    * the sum of per-block doc counts (index-native — no explode
    * before the |Q|-row aggregate), and the corpus is never touched.
    * Scores are bit-identical to [[search]] on the indexed corpus. */
  def searchIndex(index: DataFrame, scalars: DataFrame,
      terms: Seq[String], k: Int): DataFrame = {
    requireTerms(terms)
    val matched = index.where(col("term").isin(terms: _*))
    val dfs = matched.groupBy(col("term")).agg(sum(col("n_docs")).as("df"))
    val post = matched
      .select(col("term"),
        explode(split(col("postings"), ",")).as("e"))
      .withColumn("p", split(col("e"), ":"))
      .select(col("term"),
        col("p").getItem(0).cast("long").as("doc_id"),
        col("p").getItem(1).cast("long").as("tf"),
        col("p").getItem(2).cast("long").as("dl"))
    scoreTopK(post, dfs, scalars, terms, k, "doc_id")
  }

  /** Incremental index maintenance: fold a DELTA batch's index into
    * the base index — `mergeIndex(buildIndex(base), buildIndex(new))
    * == buildIndex(base ∪ new)` row-for-row when doc ids are
    * append-only disjoint (updates go through the CDC upsert first).
    * ONE full-outer join on the (term, block) key — both sides
    * shuffle on the same key, merged entry lists stay O(blockSize) —
    * so refreshing the index costs O(delta + touched blocks), never a
    * corpus rebuild. */
  def mergeIndex(base: DataFrame, delta: DataFrame): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("term"), col("block"), col("n_docs").as(s"n_$tag"),
        col("sum_tf").as(s"t_$tag"), col("postings").as(s"p_$tag"))
    // parse "doc:tf:dl" back to structs ([[parseEntries]]); sort_array
    // on the struct orders by doc_id (distinct across sides), then
    // re-serialize
    def entries(c: Column): Column = parseEntries(c)
    side(base, "a").join(side(delta, "b"), Seq("term", "block"), "full_outer")
      .select(col("term"), col("block"),
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n_docs"),
        (coalesce(col("t_a"), lit(0L)) + coalesce(col("t_b"), lit(0L))).as("sum_tf"),
        array_join(transform(
          sort_array(concat(entries(col("p_a")), entries(col("p_b")))),
          e => concat(e.getField("doc_id").cast("string"), lit(":"),
            e.getField("tf").cast("string"), lit(":"),
            e.getField("dl").cast("string"))), ",").as("postings"))
  }

  /** TOMBSTONE DELETION from the persisted index — the missing verb of
    * the index lifecycle (build → serve → compress → merge → DELETE):
    * given only the deleted DOC IDS, rewrite the affected blocks and
    * fix the global scalars, touching nothing else.
    *
    *  - Only blocks that can contain a tombstoned id (block = id DIV
    *    blockSize) are parsed; every other row passes through
    *    byte-identical — at 100 TB a delete batch costs O(touched
    *    blocks), never an index rebuild.
    *  - The deleted docs' lengths are recovered FROM THE INDEX (each
    *    posting carries dl), so deletion needs no corpus access at
    *    all. Caveat: a doc with zero tokens never entered the index —
    *    its scalars contribution must be adjusted by the caller.
    *  - df per term self-heals: [[searchIndex]] derives df from the
    *    per-block n_docs this rewrite recomputes, so post-delete
    *    scores equal a from-scratch build over the retained corpus
    *    bit for bit (the q290 gate's oracle states exactly that).
    *
    * Returns (new index, new scalars). */
  def deleteFromIndex(index: DataFrame, scalars: DataFrame,
      tombstones: DataFrame, blockSize: Int): (DataFrame, DataFrame) = {
    val tb = tombstones.select(col("doc_id").cast("long").as("del_id"))
      .withColumn("block", floor(col("del_id") / blockSize).cast("long"))
    val tbBlocks = tb.groupBy(col("block"))
      .agg(collect_list(col("del_id")).as("del_ids"))
    val untouched = index.join(tbBlocks, Seq("block"), "left_anti")
    val parsed = index.join(tbBlocks, Seq("block"))
      .withColumn("es", parseEntries(col("postings")))
    val kept = parsed.withColumn("keep", filter(col("es"),
      e => !array_contains(col("del_ids"), e.getField("doc_id"))))
    val rewritten = kept.where(size(col("keep")) > 0)
      .select(col("term"), col("block"),
        size(col("keep")).cast("long").as("n_docs"),
        aggregate(col("keep"), lit(0L),
          (a, e) => a + e.getField("tf")).as("sum_tf"),
        array_join(transform(col("keep"),
          e => concat(e.getField("doc_id").cast("string"), lit(":"),
            e.getField("tf").cast("string"), lit(":"),
            e.getField("dl").cast("string"))), ",").as("postings"))
    val delDocs = parsed
      .select(explode(col("es")).as("e"), col("del_ids"))
      .where(array_contains(col("del_ids"), col("e.doc_id")))
      .select(col("e.doc_id").as("doc_id"), col("e.dl").as("dl")).distinct()
    val delta = delDocs.agg(
      coalesce(count(lit(1)), lit(0L)).as("dn"),
      coalesce(sum(col("dl")), lit(0L)).as("ddl"))
    val newScal = scalars.crossJoin(delta)
      .select((col("n_docs") - col("dn")).as("n_docs"),
        (col("dl_sum") - col("ddl")).as("dl_sum"))
    (untouched.unionByName(rewritten), newScal)
  }

  /** Parse a serialized "doc:tf:dl,..." entry list back to structs
    * (null-safe — absent sides of outer joins become empty lists). */
  private def parseEntries(c: Column): Column =
    when(c.isNull,
      array().cast("array<struct<doc_id:bigint,tf:bigint,dl:bigint>>"))
      .otherwise(transform(split(c, ","), e => struct(
        split(e, ":").getItem(0).cast("long").as("doc_id"),
        split(e, ":").getItem(1).cast("long").as("tf"),
        split(e, ":").getItem(2).cast("long").as("dl"))))

  /** LEB128-style varint byte length of a non-negative long:
    * `max(1, ceil(bitlen/7))` via `(length(bin(x)) + 6) div 7` —
    * `bin` emits no leading zeros and maps 0 to "0", so the integer
    * arithmetic is exact and an ANSI engine replays it with
    * `printf('%b', x)`. Cast-truncate == integer div for the
    * positive operands here. */
  def varintBytes(x: Column): Column =
    ((length(bin(x)) + lit(6)) / lit(7)).cast("long")

  private def requireTerms(terms: Seq[String]): Unit = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
  }
}
