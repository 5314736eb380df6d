package graft.queries

import graft.functions.{GraftFunctions, PiiScrub, RepetitionStats}
import graft.operators.{BpeTrain, DataSplit, DomainMix, SemanticDedup,
  SequencePack}
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The END-TO-END corpus-RELEASE pipeline in production order, as ONE
  * gate: decontaminate (q116) → PII scrub (q117) → quality+repetition
  * (q43/q120) → perplexity filter (q170) → exact+near+semantic dedup
  * (q44/q118) → split (q100) → domain mix (q119) → sequence pack
  * (q104) → tokenizer encode (q174). Every stage is an
  * already-gated operator; what q107 pinned for the clean→split→pack
  * subchain, this pins for the WHOLE release: per-stage survivor
  * counts, id sums, token sums, and a stage-specific aux metric — one
  * document diverging at ANY stage (kept when it should drop, a
  * redaction differing, a tercile flipping, a bin moving, a BPE token
  * count off) fails the hash.
  *
  * Scale shape: the chain inherits each stage's already-audited plan
  * (map-only filters, banded LSH — never all-pairs, IVF-cell-scoped
  * semantic pairs, broadcast rates, one window exchange for packing);
  * survivor frames between stages are narrow (id + metadata + text)
  * and checkpointed once each ([[FrameMemo.checkpointed]], honoring
  * the reliable-dir opt-in), so the 10 stage-metric aggregations read
  * materialized survivors instead of replaying the whole upstream
  * chain per stage row.
  */
object ReleaseQueries {

  /** Packing shards / token budget (q107's fixture settings). */
  private val PackShards = 4
  private val PackBudget = 1500L
  private val PackSeed = "pk"
  private val SplitSeed = "42"

  private def releaseSql: String = {
    val ng = CurationQueries.NGram
    val em = CurationQueries.EvalMod
    // q174's encode expression: the unique word re-encoded through the
    // 8 learned merges, in training order
    val enc = (1 to TextQueries.BpeRounds).foldLeft(
      "'|' || array_to_string(string_split(word, ''), '| |') || '|'") {
      (acc, r) =>
        s"replace($acc, (SELECT pair FROM t$r), replace((SELECT pair FROM t$r), '| |', ''))"
    }
    s"""WITH ${LmQueries.modelCte},
       |${LmQueries.scoreCte},
       |${NearDupQueries.sigCte.stripPrefix("WITH ")},
       |${NearDupQueries.bandsCte},
       |${NearDupQueries.candPairsCte},
       |${SimilarityQueries.normedCte.stripPrefix("WITH ")},
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < ${SimilarityQueries.NumCentroids}),
       |${SimilarityQueries.ivfAssignSql("c0", "a0")},
       |${SimilarityQueries.ivfLloydSql("a0", "c1")},
       |${SimilarityQueries.ivfAssignSql("c1", "a1")},
       |${SimilarityQueries.ivfLloydSql("a1", "c2")},
       |${SimilarityQueries.ivfAssignSql("c2", "cell")},
       |${TextQueries.bpeCtes},
       |dk AS (SELECT doc_id, lang, source, text,
       |              len(string_split(text, ' '))::BIGINT AS n_tok
       |       FROM documents),
       |tgrams AS (
       |  SELECT doc_id, array_to_string(t[i.i:i.i+${ng - 1}], ' ') AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |        WHERE doc_id % $em <> 0) tr
       |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(t)-${ng - 2})) AS i) i
       |  WHERE len(t) >= $ng),
       |egr AS (
       |  SELECT DISTINCT array_to_string(t[i.i:i.i+${ng - 1}], ' ') AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |        WHERE doc_id % $em = 0) e2
       |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(t)-${ng - 2})) AS i) i
       |  WHERE len(t) >= $ng),
       |contam AS (SELECT DISTINCT doc_id FROM tgrams
       |           WHERE g IN (SELECT g FROM egr)),
       |s1 AS (SELECT d.* FROM dk d
       |       WHERE d.doc_id % $em <> 0
       |         AND d.doc_id NOT IN (SELECT doc_id FROM contam)),
       |pii AS (
       |  SELECT doc_id, len(string_split(rt, ' '))::BIGINT AS rtok,
       |         n_email + n_phone + n_ip AS hits
       |  FROM (
       |    SELECT doc_id,
       |           len(regexp_extract_all(at, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
       |           len(regexp_extract_all(at, '\\b\\d{3}-\\d{4}\\b'))::BIGINT AS n_phone,
       |           len(regexp_extract_all(at, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ip,
       |           regexp_replace(regexp_replace(regexp_replace(at,
       |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
       |             '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS rt
       |    FROM (
       |      SELECT doc_id,
       |             text
       |             || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
       |             || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
       |             || CASE WHEN doc_id % 11 = 0 THEN ' host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) ELSE '' END
       |             AS at
       |      FROM s1) a) h),
       |q3 AS (
       |  SELECT s1.* FROM s1
       |  WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
       |    AND len(regexp_extract_all(text, '[.,!?;:]')) * 5
       |          <= len(string_split(text, ' '))
       |    AND len(list_filter(string_split(text, ' '),
       |              t -> list_contains(${PipelineQueries.stopListSql}, t))) * 50
       |          >= len(string_split(text, ' '))
       |    AND len(list_distinct(string_split(text, ' '))) * 100
       |          >= len(string_split(text, ' ')) * 5),
       |rep AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, len(t)::BIGINT AS ntk,
       |           len(list_distinct(t))::BIGINT AS n_dist,
       |           [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS g2
       |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM s1) z) m
       |  WHERE (ntk - n_dist) * 100 >= ntk * ${CurationQueries.DupTokenPct}
       |     OR (len(g2) > 0 AND
       |         COALESCE(list_max([len(list_filter(g2, y -> y = x))
       |                            for x in list_distinct(g2)]), 0) * 100
       |           >= len(g2) * ${CurationQueries.TopGram2Pct})),
       |s3 AS (SELECT q3.* FROM q3
       |       WHERE doc_id NOT IN (SELECT doc_id FROM rep)),
       |bkt AS (
       |  SELECT s3.doc_id, s3.lang, s3.source, s3.text, s3.n_tok, d.cost_micro,
       |         ntile(3) OVER (PARTITION BY s3.lang
       |           ORDER BY CAST(d.cost_micro AS DOUBLE) / d.n_tok, s3.doc_id) AS bucket
       |  FROM s3 JOIN doc d USING (doc_id)),
       |s4 AS (SELECT doc_id, lang, source, text, n_tok, cost_micro
       |       FROM bkt WHERE bucket <= 2),
       |winner AS (SELECT min(doc_id) AS doc_id FROM (
       |             SELECT doc_id, md5(text) AS fp FROM s4) z GROUP BY fp),
       |spairs AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib
       |  FROM cell a JOIN cell b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_aggregate([a.v[i]*b.v[i]
       |                        for i in generate_series(1, ${SimilarityQueries.Dim})], 'sum')
       |          / (a.nrm*b.nrm) > ${CurationQueries.semTau}),
       |sdrop AS (SELECT DISTINCT ib FROM spairs),
       |s5 AS (SELECT s4.* FROM s4
       |       WHERE doc_id IN (SELECT doc_id FROM winner)
       |         AND doc_id NOT IN (SELECT doc_b FROM pairs)
       |         AND doc_id NOT IN (SELECT ib FROM sdrop)),
       |folded AS (
       |  SELECT f.*, CASE WHEN bp < 8000 THEN 'train'
       |                   WHEN bp < 9000 THEN 'val'
       |                   ELSE 'test' END AS fold
       |  FROM (SELECT s5.*,
       |          ('0x' || substr(md5('$SplitSeed:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS bp
       |        FROM s5) f),
       |tr2 AS (SELECT * FROM folded WHERE fold = 'train'),
       |mtot AS (SELECT sum(n_tok)::BIGINT AS all_tok,
       |                count(DISTINCT source)::BIGINT AS n_src FROM tr2),
       |mdom AS (SELECT source, sum(n_tok)::BIGINT AS dom_weight
       |         FROM tr2 GROUP BY source),
       |mrated AS (
       |  SELECT d.source,
       |         least(10000, (10000 * (t.all_tok // (${CurationQueries.MixDenom} * t.n_src))) // d.dom_weight)::BIGINT AS rate_bp
       |  FROM mdom d CROSS JOIN mtot t),
       |s7 AS (SELECT tr2.* FROM tr2 JOIN mrated r ON tr2.source = r.source
       |       WHERE ('0x' || substr(md5('${CurationQueries.MixSeed}:' || CAST(tr2.doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 < r.rate_bp),
       |pk8 AS (SELECT doc_id, n_tok,
       |               (('0x' || substr(md5('$PackSeed:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000) % $PackShards AS shard
       |        FROM s7),
       |pc8 AS (SELECT doc_id, shard, n_tok,
       |               sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |        FROM pk8),
       |pb8 AS (SELECT doc_id, shard, n_tok,
       |               CAST((cum - n_tok) // $PackBudget AS BIGINT) AS bin
       |        FROM pc8),
       |wenc9 AS MATERIALIZED (
       |  SELECT word, len(string_split($enc, ' '))::BIGINT AS n_sym FROM wc),
       |dt9 AS (SELECT doc_id, w AS word FROM (
       |          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM s7) z
       |        WHERE w <> '' AND w NOT LIKE '%|%'),
       |enc9 AS (SELECT doc_id, count(*)::BIGINT AS n_words,
       |                sum(n_sym)::BIGINT AS n_bpe
       |         FROM dt9 JOIN wenc9 USING (word) GROUP BY doc_id)
       |SELECT stage, n_docs, id_sum, tok_sum, aux FROM (
       |  SELECT '0_base' AS stage, count(*)::BIGINT AS n_docs,
       |         sum(doc_id)::BIGINT AS id_sum, sum(n_tok)::BIGINT AS tok_sum,
       |         0::BIGINT AS aux FROM dk
       |  UNION ALL SELECT '1_decontam', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_tok)::BIGINT, (SELECT count(*) FROM contam)::BIGINT FROM s1
       |  UNION ALL SELECT '2_pii', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(rtok)::BIGINT,
       |         sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)::BIGINT FROM pii
       |  UNION ALL SELECT '3_quality', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_tok)::BIGINT,
       |         ((SELECT count(*) FROM s1) - count(*))::BIGINT FROM s3
       |  UNION ALL SELECT '4_perplexity', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_tok)::BIGINT, sum(cost_micro)::BIGINT FROM s4
       |  UNION ALL SELECT '5_dedup', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_tok)::BIGINT,
       |         ((SELECT count(*) FROM s4) - count(*))::BIGINT FROM s5
       |  UNION ALL SELECT '6_split_' || fold, count(*)::BIGINT,
       |         sum(doc_id)::BIGINT, sum(n_tok)::BIGINT, 0::BIGINT
       |         FROM folded GROUP BY fold
       |  UNION ALL SELECT '7_mix', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_tok)::BIGINT, (SELECT sum(rate_bp) FROM mrated)::BIGINT FROM s7
       |  UNION ALL SELECT '8_pack', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_tok)::BIGINT, count(DISTINCT (shard, bin))::BIGINT FROM pb8
       |  UNION ALL SELECT '9_encode', count(*)::BIGINT, sum(doc_id)::BIGINT,
       |         sum(n_words)::BIGINT, sum(n_bpe)::BIGINT FROM enc9
       |) ORDER BY stage""".stripMargin
  }

  /** One stage-metric row: (stage, n_docs, id_sum, tok_sum, aux). */
  private def stageRow(name: String, df: DataFrame, tokCol: Column,
      aux: Column): DataFrame =
    df.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(tokCol).cast("long").as("tok_sum"),
        aux.cast("long").as("aux"))
      .select(lit(name).as("stage"), col("n_docs"), col("id_sum"),
        col("tok_sum"), col("aux"))

  /** stageRow with the aux read from a 1-row scalar frame. */
  private def stageRowWith(name: String, df: DataFrame, tokCol: Column,
      scalar: DataFrame, aux: Column): DataFrame =
    df.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(tokCol).cast("long").as("tok_sum"))
      .crossJoin(broadcast(scalar))
      .select(lit(name).as("stage"), col("n_docs"), col("id_sum"),
        col("tok_sum"), aux.cast("long").as("aux"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q193_corpus_release", releaseSql) { (spark, dir) =>
      import CurationQueries.{EvalMod, NGram, DupTokenPct, TopGram2Pct,
        MixDenom, MixSeed, semTau, augmented}
      GraftFunctions.register(spark)
      val ckpt = FrameMemo.checkpointed _
      val docs = Tables.loadParallel(spark, dir, "documents")
      val dk = docs.select(col("doc_id"), col("lang"), col("source"),
        col("text"), size(split(col("text"), " ")).cast("long").as("n_tok"))

      // stage 1: benchmark decontamination (train = non-eval docs) —
      // the contaminated-id frame is the SAME memoized artifact q116
      // consumes (computed once per session)
      val train = dk.where(col("doc_id") % EvalMod =!= 0)
      val contam = CurationQueries.contamIds(spark, dir)
      val s1 = ckpt(train.join(broadcast(contam), Seq("doc_id"), "left_anti"))

      // stage 2: PII scrub metrics on the survivors (planted PII, the
      // q117 convention — detection/redaction arithmetic is what runs)
      val aug = augmented(col("text"), col("doc_id"))
      val pii = s1.select(col("doc_id"),
        size(split(PiiScrub.redact(aug), " ")).cast("long").as("rtok"),
        (PiiScrub.emailCount(aug) + PiiScrub.phoneCount(aug) +
          PiiScrub.ipv4Count(aug)).as("hits"))

      // stage 3: quality rubric + Gopher repetition rules
      val toksC = split(col("text"), " ")
      val s3 = ckpt(s1.where(PipelineQueries.qualityOk(toksC, col("text")) &&
        !RepetitionStats.dupTokenFlag(toksC, DupTokenPct) &&
        !(size(RepetitionStats.grams2(toksC)) > 0 &&
          RepetitionStats.topGram2Flag(toksC, TopGram2Pct))))

      // stage 4: CCNet perplexity filter — keep head+middle terciles
      // per language; the per-doc scored frame is the SAME memoized
      // artifact q170 consumes (scoring pass runs once per session)
      val scored = LmQueries.docScored(spark, dir)
        .select(col("doc_id"), col("n_tok").as("lm_tok"), col("cost_micro"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cost_micro").cast("double") / col("lm_tok"),
          col("doc_id"))
      val s4 = ckpt(s3.join(scored, "doc_id")
        .withColumn("bucket", ntile(3).over(w))
        .where(col("bucket") <= 2)
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          col("n_tok"), col("cost_micro")))

      // stage 5: exact (keep-min per content hash, within survivors) +
      // near-dup (corpus-wide verified pairs) + semantic dedup
      val winner = s4.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val ndrop = NearDupQueries.verifiedPairs(spark, dir)
        .select(col("doc_b").as("doc_id")).distinct()
      val sdrop = SemanticDedup
        .dropIds(SimilarityQueries.ivfIndex(spark, dir), semTau)
        .select(col("vec_id").as("doc_id"))
      val s5 = ckpt(s4.join(winner, Seq("doc_id"), "left_semi")
        .join(broadcast(ndrop), Seq("doc_id"), "left_anti")
        .join(broadcast(sdrop), Seq("doc_id"), "left_anti"))

      // stage 6: deterministic fold assignment (no drops)
      val folded = DataSplit.withFold(s5, "doc_id", SplitSeed)

      // stage 7: equal-share domain mix over the TRAIN fold only
      val tr2 = folded.where(col("fold") === "train")
      val rated = DomainMix.rates(
        tr2.select(col("doc_id"), col("source"), col("n_tok")),
        "source", col("n_tok"), MixDenom)
      val s7 = ckpt(tr2
        .join(broadcast(rated.select(col("source"), col("rate_bp"))), "source")
        .where(DataSplit.bucketBp(col("doc_id"), MixSeed) < col("rate_bp"))
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          col("n_tok")))

      // stage 8: token-budget sequence packing of the mixed train set
      val packed = SequencePack.assignBins(
        s7.select(col("doc_id"), col("n_tok")), "doc_id", "n_tok",
        numShards = PackShards, budgetTokens = PackBudget, seed = PackSeed)

      // stage 9: BPE encode under the corpus-trained merge table —
      // the SAME memoized merges q167/q174 consume (trained once per
      // session)
      val merges = TextQueries.bpeMerges(spark, dir)
      val enc = BpeTrain.encodeCounts(s7, "text", "doc_id", merges)

      stageRow("0_base", dk, col("n_tok"), lit(0L))
        .unionByName(stageRowWith("1_decontam", s1, col("n_tok"),
          contam.agg(count(lit(1)).as("_c")), col("_c")))
        .unionByName(stageRow("2_pii", pii, col("rtok"),
          sum(when(col("hits") > 0, 1L).otherwise(0L))))
        .unionByName(stageRowWith("3_quality", s3, col("n_tok"),
          s1.agg(count(lit(1)).as("_n1")), col("_n1") - col("n_docs")))
        .unionByName(stageRow("4_perplexity", s4, col("n_tok"),
          sum(col("cost_micro"))))
        .unionByName(stageRowWith("5_dedup", s5, col("n_tok"),
          s4.agg(count(lit(1)).as("_n4")), col("_n4") - col("n_docs")))
        .unionByName(folded.groupBy(col("fold"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("doc_id")).cast("long").as("id_sum"),
            sum(col("n_tok")).cast("long").as("tok_sum"))
          .select(concat(lit("6_split_"), col("fold")).as("stage"),
            col("n_docs"), col("id_sum"), col("tok_sum"),
            lit(0L).as("aux")))
        .unionByName(stageRowWith("7_mix", s7, col("n_tok"),
          rated.agg(sum(col("rate_bp")).as("_rs")), col("_rs")))
        .unionByName(stageRow("8_pack", packed, col("n_tok"),
          countDistinct(col("shard"), col("bin"))))
        .unionByName(enc.agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("doc_id")).cast("long").as("id_sum"),
            sum(col("n_words")).cast("long").as("tok_sum"),
            sum(col("n_bpe_tokens")).cast("long").as("aux"))
          .select(lit("9_encode").as("stage"), col("n_docs"), col("id_sum"),
            col("tok_sum"), col("aux")))
        .orderBy(col("stage"))
    }
  )
}
