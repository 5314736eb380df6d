package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed stupid-backoff trigram language model (Brants et al.
  * 2007, "Large Language Models in Machine Translation", EMNLP —
  * the counting-only LM built exactly because it scales to web-corpus
  * training where smoothed Kneser-Ney does not). The CCNet curation
  * pipeline (Wenzek et al. 2019, arXiv:1911.00359) uses an LM of this
  * family to perplexity-score and bucket crawl text; q168-q170 are
  * that pipeline re-expressed Spark-first. No reference
  * implementation (the reference ships only the median UDA); this is
  * a driver-mandated LLM-pipeline extension.
  *
  * Design for 100 TB:
  *
  *  - **One corpus scan.** Trigram counts are the only aggregation
  *    that touches the corpus; bigram and unigram tables are
  *    rollups of the (much smaller) trigram frame. The padding
  *    convention (2 BOS + tokens + EOS) makes the rollup exact: every
  *    bigram occurrence is the tail of exactly one trigram except the
  *    per-doc `(<s>,<s>)` head, whose count is recovered in-plan as
  *    the `(<s>,<s>,*)` trigram sum — no driver collect anywhere.
  *  - **Model-side probabilities.** Each backoff level's conditional
  *    is divided ONCE on the model frame (`tri JOIN big`,
  *    `big JOIN uni`), so scoring is three left equi-joins instead of
  *    five — the shuffle keys are the n-gram columns, the natural
  *    distribution for a model too large to broadcast. The unigram
  *    table and the scalars row are broadcast-class.
  *  - **Integer micro-nat costs.** Per-token cost is quantized to
  *    `round(-ln(s) * 1e6)` BIGINT before the per-doc sum, so the
  *    aggregation is exact integer arithmetic — immune to
  *    float-sum ordering across partitions (and the DuckDB oracle
  *    replays it bit-for-bit: ln agrees with `java.lang.Math.log` on
  *    every tested rational, and all divisions are single IEEE ops).
  *
  * Backoff chain (Brants et al. §4, discount 0.4 per level):
  * `s(w2|w0,w1) = tri/big(w0,w1)` if the trigram was seen, else
  * `0.4 * big(w1,w2)/uni(w1)` if the bigram was seen, else
  * `0.16 * (uni(w2)+1)/(total+V+1)` — add-one smoothing at the floor
  * so unseen words score finitely (OOV mass `1/(total+V+1)`).
  */
object NgramLm {

  val Bos = "<s>"
  val Eos = "</s>"

  /** Stupid-backoff discount per backed-off level. */
  val Alpha = 0.4

  /** Micro-nat quantization scale for per-token costs. */
  val CostScale = 1e6

  /** Trained model: n-gram count frames plus the scalars row
    * (`total` token mass, `v` vocabulary size). */
  final case class Model(tri: DataFrame, big: DataFrame, uni: DataFrame,
      scal: DataFrame)

  /** Padded token array: 2 BOS sentinels + non-empty tokens + EOS, so
    * every real token (and the EOS) is scored with a full 2-token
    * context. Text tokens literally equal to the `<s>`/`</s>`
    * sentinels are DROPPED (both here and in the oracle's mirror
    * filter) — otherwise they would be conflated with the BOS/EOS
    * markers and silently corrupt the context counts; real
    * deployments that must score such tokens pre-escape them. */
  def padded(text: Column): Column =
    concat(array(lit(Bos), lit(Bos)),
      filter(split(text, " "),
        t => t =!= "" && t =!= Bos && t =!= Eos), array(lit(Eos)))

  /** Trigram positions (occurrences, not distinct) as (keep...,
    * w0, w1, w2). The padded array is hoisted to its own projection
    * and the explode is outer + null-filtered — the
    * InferFiltersFromGenerate planner lesson from
    * [[SubstringDedup]]. */
  def positions(docs: DataFrame, textCol: String,
      keep: Seq[String]): DataFrame = {
    val p = col("_p")
    docs.select(keep.map(col) :+ padded(col(textCol)).as("_p"): _*)
      .select(keep.map(col) :+
        explode_outer(transform(sequence(lit(1), size(p) - 2),
          i => struct(element_at(p, i).as("w0"),
            element_at(p, i + 1).as("w1"),
            element_at(p, i + 2).as("w2")))).as("_g"): _*)
      .where(col("_g").isNotNull)
      .select(keep.map(col) ++ Seq(col("_g.w0"), col("_g.w1"),
        col("_g.w2")): _*)
  }

  /** Train the count tables from `docs(textCol)` — one corpus scan,
    * two model-frame rollups, one scalars aggregation. */
  def train(docs: DataFrame, textCol: String): Model = {
    val tri = positions(docs, textCol, Seq.empty)
      .groupBy(col("w0"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    // tail rollup + the per-doc (<s>,<s>) head bigram recovered from
    // the (<s>,<s>,*) trigram mass — exact, and fully in-plan
    val big = tri.select(col("w1").as("b0"), col("w2").as("b1"), col("c"))
      .unionByName(tri.where(col("w0") === Bos && col("w1") === Bos)
        .select(col("w0").as("b0"), col("w1").as("b1"), col("c")))
      .groupBy(col("b0"), col("b1")).agg(sum(col("c")).as("c"))
    val uni = big.select(col("b1").as("u"), col("c"))
      .unionByName(big.where(col("b0") === Bos && col("b1") === Bos)
        .select(col("b0").as("u"), col("c")))
      .groupBy(col("u")).agg(sum(col("c")).as("c"))
    val scal = uni.agg(sum(col("c")).as("total"), count(lit(1)).as("v"))
    Model(tri, big, uni, scal)
  }

  /** Merge two trained models — every count table is a linear
    * aggregation of its corpus, so per-key sums of partial models ARE
    * the full-corpus model (the mergeable-state property that lets a
    * 100 TB LM refresh fold in a new ingest batch without re-scanning
    * history; the scalars row re-derives from the merged unigrams
    * because vocabulary size is NOT additive across batches). */
  def merge(a: Model, b: Model): Model = {
    def m(x: DataFrame, y: DataFrame, keys: String*) =
      x.unionByName(y).groupBy(keys.map(col): _*).agg(sum(col("c")).as("c"))
    val uni = m(a.uni, b.uni, "u")
    Model(m(a.tri, b.tri, "w0", "w1", "w2"), m(a.big, b.big, "b0", "b1"),
      uni, uni.agg(sum(col("c")).as("total"), count(lit(1)).as("v")))
  }

  /** Model-side conditional probabilities — each level divided once
    * on the model frame so scoring needs only left joins. */
  def probTables(m: Model): (DataFrame, DataFrame, DataFrame) = {
    val triS = m.tri.as("t")
      .join(m.big.as("b"),
        col("t.w0") === col("b.b0") && col("t.w1") === col("b.b1"))
      .select(col("t.w0"), col("t.w1"), col("t.w2"),
        (col("t.c").cast("double") / col("b.c").cast("double")).as("p3"))
    val bigS = m.big.as("b")
      .join(m.uni.as("u"), col("b.b0") === col("u.u"))
      .select(col("b.b0"), col("b.b1"),
        (col("b.c").cast("double") / col("u.c").cast("double")).as("p2"))
    val uniS = m.uni.as("u").crossJoin(broadcast(m.scal))
      .select(col("u.u"),
        ((col("c") + 1).cast("double") /
          (col("total") + col("v") + 1).cast("double")).as("p1"))
    (triS, bigS, uniS)
  }

  /** Per-document LM cost: (keep..., n_tok, cost_micro) where
    * cost_micro = Σ round(-ln(s) * 1e6) over scored positions.
    * `keep` must include a grouping identity (doc_id). */
  def score(docs: DataFrame, textCol: String, m: Model,
      keep: Seq[String]): DataFrame = {
    val (triS, bigS, uniS) = probTables(m)
    val pos = positions(docs, textCol, keep)
    val scored = pos
      .join(triS, Seq("w0", "w1", "w2"), "left")
      .join(bigS, pos("w1") === bigS("b0") && pos("w2") === bigS("b1"),
        "left")
      .join(uniS, pos("w2") === uniS("u"), "left")
      .crossJoin(broadcast(m.scal))
    val oov = lit(1.0) / (col("total") + col("v") + 1).cast("double")
    // alpha^2 spelled as a product, NOT a 0.16 literal: 0.4*0.4
    // rounds to 0.16000000000000003 in IEEE doubles, and the oracle
    // must fold the identical constant
    val s = coalesce(col("p3"), lit(Alpha) * col("p2"),
      lit(Alpha) * lit(Alpha) * coalesce(col("p1"), oov))
    scored
      .select(keep.map(col) :+
        round(-log(s) * lit(CostScale)).cast("long").as("_cost"): _*)
      .groupBy(keep.map(col): _*)
      .agg(count(lit(1)).as("n_tok"), sum(col("_cost")).as("cost_micro"))
  }
}
