package graft.queries

import graft.operators.NgramLm
import graft.sources.Tables

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CCNet-style language-model curation family (SURVEY §2.3 text
  * analysis / curation): train a stupid-backoff trigram LM on a
  * training split ([[NgramLm]]), perplexity-score every document
  * against it, and bucket documents per language into
  * head/middle/tail terciles — the exact shape Wenzek et al.
  * (arXiv:1911.00359) use to curate CommonCrawl for LLM pretraining.
  *
  * Gate design: the train split is `doc_id % 2 = 0`, so half the
  * corpus is HELD OUT — scored docs hit unseen trigrams/bigrams and
  * exercise every backoff level (verified: held-out docs average
  * ~3.6 nats/token vs ~2.4 for train docs on the fixture). All
  * compared outputs are integers (counts, micro-nat sums, tercile
  * ids); doubles exist only inside the per-token expression, where
  * every operation is a single IEEE op or an `ln` (bit-identical
  * between `java.lang.Math.log` and DuckDB — verified on 2000
  * fixture-class rationals).
  */
object LmQueries {

  /** Train-split predicate, shared by the Spark side and the oracle
    * text: even doc_ids train, everything scores. */
  private[queries] val TrainSplitSql = "doc_id % 2 = 0"

  private def trainDocs(docs: org.apache.spark.sql.DataFrame) =
    docs.where(col("doc_id") % 2 === 0)

  /** Per-document LM perplexity scores (train on the even split,
    * score everything), memoized per (session, dir): the q170 CCNet
    * filter and the q193 release chain consume the SAME frame, so the
    * corpus-wide scoring pass runs once per session — the IndexStore
    * discipline (corpus artifacts are computed once; consumers read
    * them). */
  private[queries] def docScored(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    FrameMemo.memoized(spark, s"lmscored:$dir") {
      val docs = Tables.loadParallel(spark, dir, "documents")
      // doc_id is the grouping grain; lang/source are doc-functional
      // attributes carried through so EVERY consumer (q169 per-doc,
      // q170/q189 per-lang terciles, q198 per-source losses, q193's
      // stage 4) reads this one frame instead of re-running the
      // train+score chain — round-19: q169/q170/q198 previously
      // retrained the same LM per gate (~3 s each of duplicate work
      // per bench pass).
      NgramLm.score(docs, "text", NgramLm.train(trainDocs(docs), "text"),
        Seq("doc_id", "lang", "source"))
    }

  /** q198 MWU constants: uniform init weight, update scale K (4 nats
    * in micro-nats — the linearized learning rate eta = 1/K per
    * micro-nat of excess), excess clamp ±K/2 (keeps every operand
    * positive and the per-round growth within [0.5x, 1.5x]), and the
    * round count. */
  private[queries] val MwuW0 = 1000000L
  private[queries] val MwuK = 4000000
  private[queries] val MwuClamp = 2000000
  private[queries] val MwuRounds = 5

  /** Shared oracle CTE chain: padded tokens, trigram positions over
    * ALL docs, and the model counts (tri/big/uni/scal) from the train
    * split — the SQL mirror of [[NgramLm.train]], including the
    * in-plan recovery of the per-doc `(<s>,<s>)` head bigram. */
  private[queries] val modelCte =
    s"""toks AS (
       |  SELECT doc_id, lang,
       |         ['<s>','<s>'] || list_filter(string_split(text,' '), t -> t <> '' AND t <> '<s>' AND t <> '</s>') || ['</s>'] AS p
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, g.w0 AS w0, g.w1 AS w1, g.w2 AS w2 FROM (
       |    SELECT doc_id, unnest([{'w0': p[i], 'w1': p[i+1], 'w2': p[i+2]}
       |                           for i in generate_series(1, len(p)-2)]) AS g
       |    FROM toks) z),
       |tri AS (
       |  SELECT w0, w1, w2, count(*)::BIGINT AS c FROM pos
       |  WHERE $TrainSplitSql GROUP BY 1, 2, 3),
       |big AS (
       |  SELECT b0, b1, sum(c)::BIGINT AS c FROM (
       |    SELECT w1 AS b0, w2 AS b1, c FROM tri
       |    UNION ALL
       |    SELECT w0, w1, c FROM tri WHERE w0 = '<s>' AND w1 = '<s>') u
       |  GROUP BY 1, 2),
       |uni AS (
       |  SELECT u, sum(c)::BIGINT AS c FROM (
       |    SELECT b1 AS u, c FROM big
       |    UNION ALL
       |    SELECT b0, c FROM big WHERE b0 = '<s>' AND b1 = '<s>') u2
       |  GROUP BY 1),
       |scal AS (SELECT sum(c)::BIGINT AS total, count(*)::BIGINT AS v FROM uni)""".stripMargin

  /** Scoring tail shared by q169/q170: model-side conditionals, the
    * stupid-backoff coalesce (alpha = 0.4 spelled as a PRODUCT for
    * the alpha^2 level — 0.4*0.4 != 0.16 in doubles), and the
    * micro-nat quantization. */
  private[queries] val scoreCte =
    s"""tri_s AS (
       |  SELECT t.w0, t.w1, t.w2, CAST(t.c AS DOUBLE) / CAST(b.c AS DOUBLE) AS p3
       |  FROM tri t JOIN big b ON t.w0 = b.b0 AND t.w1 = b.b1),
       |big_s AS (
       |  SELECT b.b0, b.b1, CAST(b.c AS DOUBLE) / CAST(u.c AS DOUBLE) AS p2
       |  FROM big b JOIN uni u ON b.b0 = u.u),
       |uni_s AS (
       |  SELECT u, CAST(c + 1 AS DOUBLE) / CAST(total + v + 1 AS DOUBLE) AS p1
       |  FROM uni CROSS JOIN scal),
       |sc AS (
       |  SELECT p.doc_id,
       |         CAST(round(-ln(coalesce(t.p3, 0.4 * b.p2,
       |              0.4 * 0.4 * coalesce(u.p1, 1.0 / CAST(total + v + 1 AS DOUBLE))))
       |              * 1000000.0) AS BIGINT) AS cost
       |  FROM pos p
       |  LEFT JOIN tri_s t ON p.w0 = t.w0 AND p.w1 = t.w1 AND p.w2 = t.w2
       |  LEFT JOIN big_s b ON p.w1 = b.b0 AND p.w2 = b.b1
       |  LEFT JOIN uni_s u ON p.w2 = u.u
       |  CROSS JOIN scal),
       |doc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tok, sum(cost)::BIGINT AS cost_micro
       |  FROM sc GROUP BY doc_id)""".stripMargin

  /** Shared build-gate SQL (q168, and q175's oracle verbatim — the
    * incremental merge must be invisible against the direct train). */
  private val buildSql =
    s"""WITH $modelCte
       |SELECT ord, gram, n, rank FROM (
       |  SELECT ord, gram, n,
       |         CAST(row_number() OVER (PARTITION BY ord ORDER BY n DESC, gram) AS BIGINT) AS rank
       |  FROM (SELECT 3::BIGINT AS ord, w0 || ' ' || w1 || ' ' || w2 AS gram, c AS n FROM tri
       |        UNION ALL SELECT 2::BIGINT, b0 || ' ' || b1, c FROM big
       |        UNION ALL SELECT 1::BIGINT, u, c FROM uni) g) r
       |WHERE rank <= 10 ORDER BY ord, rank""".stripMargin

  /** Top-10-per-order presentation of a model's count tables. */
  private def topGrams(m: NgramLm.Model) = {
    val grams = m.tri.select(lit(3L).as("ord"),
      concat_ws(" ", col("w0"), col("w1"), col("w2")).as("gram"),
      col("c").as("n"))
      .unionByName(m.big.select(lit(2L).as("ord"),
        concat_ws(" ", col("b0"), col("b1")).as("gram"), col("c").as("n")))
      .unionByName(m.uni.select(lit(1L).as("ord"),
        col("u").as("gram"), col("c").as("n")))
    val w = Window.partitionBy(col("ord"))
      .orderBy(col("n").desc, col("gram"))
    grams.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 10)
      .orderBy(col("ord"), col("rank"))
  }

  val defs: Seq[QueryDef] = Seq(

    // LM TRAINING gate: the count tables themselves. One corpus scan
    // (trigram agg), two model-frame rollups, top-10 per order by
    // (count desc, gram) — all integers. At 100 TB the trigram agg is
    // a map-side-combined shuffle on the gram key and the rollups
    // shuffle only the model frame.
    QueryDef("q168_ngram_lm_build", buildSql) { (spark, dir) =>
      topGrams(NgramLm.train(
        trainDocs(Tables.load(spark, dir, "documents")), "text"))
    },

    // INCREMENTAL model refresh: two disjoint batch models merged by
    // per-key count sums must equal the direct full train — the
    // mergeable-state property that folds a new ingest batch into a
    // 100 TB LM without re-scanning history (the q158 matview
    // convention applied to the LM). Oracle = q168's text verbatim.
    QueryDef("q175_lm_incremental", buildSql) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val a = NgramLm.train(
        docs.where(col("doc_id") % 4 === 0), "text")
      val b = NgramLm.train(
        docs.where(col("doc_id") % 4 === 2), "text")
      topGrams(NgramLm.merge(a, b))
    },

    // Per-document perplexity scoring against the train-split model:
    // three left equi-joins on model conditionals, per-token micro-nat
    // costs, exact integer per-doc sums. The held-out half exercises
    // every backoff level.
    QueryDef("q169_doc_perplexity",
      s"""WITH $modelCte,
         |$scoreCte
         |SELECT doc_id, n_tok, cost_micro FROM doc ORDER BY doc_id""".stripMargin) {
      (spark, dir) =>
        docScored(spark, dir)
          .select(col("doc_id"), col("n_tok"), col("cost_micro"))
          .orderBy(col("doc_id"))
    },

    // CCNet bucketing: per-language perplexity terciles
    // (head/middle/tail) over avg micro-nat cost with doc_id
    // tie-break — the curation split that keeps head+middle for
    // pretraining. Output is per-(lang, bucket) integer aggregates.
    // The CCNet chain END-TO-END: perplexity terciles (q170's rule,
    // keep head+middle per language) COMPOSED with exact dedup
    // (keep the min-id copy per content hash) — the actual Wenzek et
    // al. pipeline order, materialized as per-language integer
    // summaries. Proves the LM-curation and dedup families compose
    // in one plan: the tercile window, the md5 winner agg, and the
    // final rollup share the same corpus scan lineage.
    QueryDef("q189_ccnet_pipeline",
      s"""WITH $modelCte,
         |$scoreCte,
         |bkt AS (
         |  SELECT t.doc_id, t.lang, d.n_tok, d.cost_micro,
         |         ntile(3) OVER (PARTITION BY t.lang
         |           ORDER BY CAST(d.cost_micro AS DOUBLE) / d.n_tok, d.doc_id) AS bucket
         |  FROM doc d JOIN (SELECT DISTINCT doc_id, lang FROM documents) t USING (doc_id)),
         |winner AS (
         |  SELECT min(doc_id) AS doc_id FROM (
         |    SELECT doc_id, md5(text) AS fp FROM documents) z GROUP BY fp),
         |kept AS (
         |  SELECT b.lang, b.doc_id, b.n_tok, b.cost_micro
         |  FROM bkt b JOIN winner USING (doc_id) WHERE b.bucket <= 2)
         |SELECT lang, count(*)::BIGINT AS n_kept,
         |       sum(n_tok)::BIGINT AS tok_kept,
         |       sum(cost_micro)::BIGINT AS cost_kept,
         |       sum(doc_id)::BIGINT AS kept_id_sum
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val scored = docScored(spark, dir)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cost_micro").cast("double") / col("n_tok"),
          col("doc_id"))
      val kept1 = scored.withColumn("bucket", ntile(3).over(w))
        .where(col("bucket") <= 2)
      val winner = docs.select(col("doc_id"), md5(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      kept1.join(winner, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tok_kept"),
          sum(col("cost_micro")).as("cost_kept"),
          sum(col("doc_id")).as("kept_id_sum"))
        .orderBy(col("lang"))
    },

    QueryDef("q170_perplexity_filter",
      s"""WITH $modelCte,
         |$scoreCte,
         |bkt AS (
         |  SELECT t.lang, d.n_tok, d.cost_micro,
         |         ntile(3) OVER (PARTITION BY t.lang
         |           ORDER BY CAST(d.cost_micro AS DOUBLE) / d.n_tok, d.doc_id) AS bucket
         |  FROM doc d JOIN (SELECT DISTINCT doc_id, lang FROM documents) t USING (doc_id))
         |SELECT lang, bucket::BIGINT AS bucket, count(*)::BIGINT AS n_docs,
         |       sum(n_tok)::BIGINT AS n_tok_sum, sum(cost_micro)::BIGINT AS cost_sum
         |FROM bkt GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin) {
      (spark, dir) =>
        val scored = docScored(spark, dir)
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("cost_micro").cast("double") / col("n_tok"),
            col("doc_id"))
        scored.withColumn("bucket", ntile(3).over(w).cast("long"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tok_sum"),
            sum(col("cost_micro")).as("cost_sum"))
          .orderBy(col("lang"), col("bucket"))
    },

    // DoReMi-style domain reweighting (Xie et al. 2023,
    // arXiv:2305.10429, "DoReMi: Optimizing Data Mixtures Speeds Up
    // Language Model Pretraining"): per-domain LM losses drive
    // multiplicative-weights rounds that upweight domains with EXCESS
    // loss relative to the current mixture. The update is the
    // linearized MWU w <- w·(1 + excess/K) (Arora-Hazan-Kale 2012)
    // in EXACT integer arithmetic — excess clamped to ±K/2 micro-nats
    // so every operand stays positive and bounded (w <= w0·1.5^T,
    // w·loss < 2^47) — because exp() would fork the engines on
    // libm rounding. Scale shape: ONE corpus scan (the LM scoring
    // pass) collapses to a |domains|-row frame; the T mixture rounds
    // iterate on that broadcast-class frame only, so the iteration
    // costs nothing at 100 TB regardless of T.
    QueryDef("q198_doremi_mix",
      s"""WITH $modelCte,
         |$scoreCte,
         |dom AS (
         |  SELECT s.source, (sum(d.cost_micro) // sum(d.n_tok))::BIGINT AS loss
         |  FROM doc d JOIN documents s USING (doc_id) GROUP BY s.source),
         |w0 AS (SELECT source, loss, ${MwuW0}::BIGINT AS w FROM dom),
         |${(1 to MwuRounds).map { t =>
           val prev = s"w${t - 1}"
           s"""w$t AS (
              |  SELECT source, loss, greatest(1::BIGINT,
              |    (w * ($MwuK + greatest(-$MwuClamp, least($MwuClamp,
              |       loss - (SELECT (sum(w * loss) // sum(w))::BIGINT FROM $prev))))) // $MwuK)::BIGINT AS w
              |  FROM $prev)""".stripMargin
         }.mkString(",\n")}
         |SELECT source, loss AS loss_mn, w,
         |       ((10000 * w) // (SELECT sum(w) FROM w$MwuRounds))::BIGINT AS rate_bp
         |FROM w$MwuRounds ORDER BY source""".stripMargin) { (spark, dir) =>
      val scored = docScored(spark, dir)
      // materialize the per-domain loss table ONCE: `cur` is read
      // twice per MWU round (the mix scalar + the reweight join) and
      // once more for the final normalizer — without the cut, every
      // read re-executes the whole LM train+score chain upstream
      // (measured 18.9 s -> the chain's one-pass cost at sf0.1)
      var cur = graft.queries.FrameMemo.checkpointed(
        scored.groupBy(col("source"))
          .agg(expr("sum(cost_micro) DIV sum(n_tok)").as("loss"))
          .withColumn("w", lit(MwuW0)))
      for (_ <- 1 to MwuRounds) {
        val mix = cur.agg(expr("sum(w * loss) DIV sum(w)").as("mix"))
        cur = graft.queries.FrameMemo.checkpointed(
          cur.crossJoin(broadcast(mix))
            .withColumn("w", greatest(lit(1L), expr(
              s"(w * ($MwuK + greatest(-$MwuClamp, least($MwuClamp, loss - mix)))) DIV $MwuK")))
            .drop("mix"))
      }
      cur.crossJoin(broadcast(cur.agg(sum(col("w")).as("w_sum"))))
        .select(col("source"), col("loss").as("loss_mn"), col("w"),
          expr("(10000 * w) DIV w_sum").as("rate_bp"))
        .orderBy(col("source"))
    }
  )
}
