package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-pair training (Sennrich et al. 2015,
  * arXiv:1508.07909) — the tokenizer-TRAINING counterpart to the
  * encode-only path (q157): learn the merge table itself from the
  * corpus. No reference implementation; driver-mandated text-analysis
  * extension.
  *
  * The classic formulation iterates: count adjacent symbol pairs,
  * merge the most frequent pair everywhere, repeat. Re-expressed for
  * 100 TB:
  *
  *  - **The state is the UNIQUE-WORD frame, not the corpus.** One
  *    shuffle builds (word, count) — 10⁷-row class at any corpus
  *    size — and every training round runs on that frame alone. The
  *    corpus is scanned exactly once.
  *  - **One map-side-combined aggregation per round** counts pairs
  *    weighted by word frequency; the argmax pair (count desc, pair
  *    asc for determinism) is a 1-row driver scalar — planning-class,
  *    the same cost posture as a Lloyd round's centroid pull.
  *  - **Merging is a map-only string rewrite.** Words are encoded as
  *    pipe-delimited symbol strings (`"abc"` -> `"|a| |b| |c|"`);
  *    applying merge (a, b) is `replace(ws, "|a| |b|", "|ab|")` —
  *    non-overlapping left-to-right, IDENTICAL semantics in Spark and
  *    ANSI SQL (the q167 oracle replays every round byte-for-byte),
  *    and equal to the greedy left-fold on the symbol list because
  *    the boundary spaces are not shared between adjacent matches.
  *  - Per-round checkpointing ([[graft.queries.FrameMemo.checkpointed]]
  *    — reliable dir when `spark.graft.memo.reliable=true`, local
  *    otherwise) keeps round plans flat (the [[IvfIndex.refine]]
  *    pattern) instead of stacking R rewrites of the whole lineage.
  *
  * Tokens containing the `|` sentinel are excluded on both sides (the
  * encoding would be ambiguous); real deployments pick a
  * non-colliding sentinel or pre-escape.
  */
object BpeTrain {

  /** One learned merge: the pair in symbol-string form (`"|a| |b|"`),
    * the merged symbol (`"|ab|"`), and its weighted count. */
  final case class Merge(round: Int, pair: String, merged: String, n: Long)

  /** (word, c) unique-word frame — the only corpus-wide pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").contains("|"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))

  /** Pipe-delimited symbol encoding of a word column. */
  def encodeSymbols(word: Column): Column =
    concat(lit("|"), array_join(split(word, ""), "| |"), lit("|"))

  /** Adjacent-pair counts over an encoded (ws, c) frame, weighted by
    * word frequency. The symbol array is hoisted to its own
    * projection (the [[SubstringDedup.occurrences]] planner lesson)
    * and the explode is outer + null-filtered for the same
    * InferFiltersFromGenerate reason. */
  def pairCounts(words: DataFrame): DataFrame = {
    val s = col("_syms")
    words
      .select(col("c"), split(col("ws"), " ").as("_syms"))
      .select(col("c"),
        when(size(s) >= 2,
          transform(sequence(lit(1), size(s) - 1),
            i => concat(element_at(s, i), lit(" "), element_at(s, i + 1))))
          .otherwise(array().cast("array<string>")).as("_prs"))
      .select(col("c"), explode_outer(col("_prs")).as("pair"))
      .where(col("pair").isNotNull)
      .groupBy(col("pair")).agg(sum(col("c")).as("n"))
  }

  /** Apply learned merges, in training order, to a pipe-encoded
    * symbol column — the same engine-identical `replace` semantics
    * the training loop uses. */
  def applyMerges(ws: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(ws)((c, m) =>
      call_function("replace", c, lit(m.pair), lit(m.merged)))

  /** Per-document token counts under a trained merge list — the
    * ENCODE side of the tokenizer lifecycle (train = [[train]],
    * deterministic id assignment = the q157 vocab path). The
    * unique-word frame is encoded ONCE (map-only replace chain over
    * |vocab| rows, not |corpus| tokens); document tokens then join
    * word → symbol-count on the word key — a shuffle join on `word`,
    * the right shape when the unique-word frame is too large to
    * broadcast at corpus scale. Words containing the `|` sentinel are
    * excluded exactly as in training. Returns
    * (idCol, n_words, n_bpe_tokens). */
  def encodeCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = wordCounts(docs, textCol)
      .select(col("word"),
        size(split(applyMerges(encodeSymbols(col("word")), merges), " "))
          .cast("long").as("n_sym"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").contains("|"))
      .join(words, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }

  /** Learn `rounds` merges from `docs(textCol)`. */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import graft.queries.FrameMemo.checkpointed
    var words = checkpointed(wordCounts(docs, textCol)
      .select(encodeSymbols(col("word")).as("ws"), col("c")))
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is one symbol
      else {
        val pair = top.head.getString(0)
        val n = top.head.getLong(1)
        val merged = pair.replace("| |", "")
        merges += Merge(r, pair, merged, n)
        words = checkpointed(words
          .select(call_function("replace",
            col("ws"), lit(pair), lit(merged)).as("ws"), col("c")))
        r += 1
      }
    }
    merges.result()
  }
}
