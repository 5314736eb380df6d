package graft.queries

import graft.sources.Tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pass an LLM-data pipeline actually
  * runs, end to end in ONE declared query: quality rubric → exact
  * dedup (keep lowest doc_id per content hash) → near-dup removal
  * (drop the higher id of every Jaccard-verified pair). Each stage is
  * an operator already gated on its own (q17, q23, q43); this pins
  * their COMPOSITION — survivors only.
  *
  * Scale shape: quality is a per-row filter inside the scan; dedup is
  * the fingerprint aggregation; near-dup is the banded-LSH join; the
  * final survivor check is two joins on doc_id (semi + anti), all
  * equi-joins. Nothing quadratic, nothing driver-side.
  */
object PipelineQueries {

  private val StopWords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  private[queries] val stopListSql = StopWords.map(s => s"'$s'").mkString("[", ", ", "]")

  private[queries] def qualityOk(toks: Column, text: Column): Column = {
    val stopArr = array(StopWords.map(lit): _*)
    size(toks).between(10, 1000) &&
      size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))) * 5 <= size(toks) &&
      size(filter(toks, t => array_contains(stopArr, t))) * 50 >= size(toks) &&
      size(array_distinct(toks)) * 100 >= size(toks) * 5
  }

  /** The q44 survivor CTE chain (cand → neardup_drop → dedup_keep →
    * quality → surv), shared verbatim with the q107 end-to-end
    * pipeline so the cleaning rules cannot fork between the two
    * gates. Must follow sigCte + bandsCte. */
  private val survivorsCte =
    s"""cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
       |neardup_drop AS (
       |  SELECT DISTINCT doc_b FROM (
       |    SELECT doc_a, doc_b,
       |           len(list_intersect(sa.s, sb.s)) AS nc,
       |           len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS nu
       |    FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
       |              JOIN sh sb ON cand.doc_b = sb.doc_id) t
       |  WHERE nc * 10 >= nu * 7),
       |dedup_keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
       |quality AS (
       |  SELECT doc_id FROM documents
       |  WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
       |    AND len(regexp_extract_all(text, '[.,!?;:]')) * 5
       |          <= len(string_split(text, ' '))
       |    AND len(list_filter(string_split(text, ' '),
       |              t -> list_contains($stopListSql, t))) * 50
       |          >= len(string_split(text, ' '))
       |    AND len(list_distinct(string_split(text, ' '))) * 100
       |          >= len(string_split(text, ' ')) * 5),
       |surv AS (
       |  SELECT d.doc_id, d.lang, d.text FROM documents d
       |  JOIN dedup_keep k ON d.doc_id = k.doc_id
       |  JOIN quality q ON d.doc_id = q.doc_id
       |  LEFT JOIN neardup_drop nd ON d.doc_id = nd.doc_b
       |  WHERE nd.doc_b IS NULL)""".stripMargin

  /** The q44 Spark pipeline as a reusable frame: survivors of
    * quality → exact-dedup-keep → near-dup drop, with lang + text. */
  private def cleanSurvivors(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val base = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val quality = base.where(qualityOk(toks, col("text"))).select(col("doc_id"))
    val dedupKeep = base
      .groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val nearDupDrop = NearDupQueries.verifiedPairs(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    base.select(col("doc_id"), col("lang"), col("text"))
      .join(dedupKeep, Seq("doc_id"), "left_semi")
      .join(quality, Seq("doc_id"), "left_semi")
      .join(nearDupDrop, Seq("doc_id"), "left_anti")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q44_clean_corpus",
      s"""${NearDupQueries.sigCte},
         |${NearDupQueries.bandsCte},
         |$survivorsCte
         |SELECT doc_id FROM surv
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      cleanSurvivors(spark, dir).select(col("doc_id")).orderBy(col("doc_id"))
    },

    // Keep-BEST dedup: real pipelines keep the richest member of each
    // near-dup CLUSTER (transitive closure, q60), not blindly the
    // lowest id of each pair. Unclustered docs are their own cluster;
    // "best" = most tokens, ties to the lowest doc_id. Composes the
    // cluster operator with text stats in two equi-joins + one
    // per-cluster window.
    QueryDef("q72_cluster_keep_best",
      s"""WITH RECURSIVE ${NearDupQueries.sigCte.stripPrefix("WITH ")},
         |${NearDupQueries.bandsCte},
         |${NearDupQueries.closureCte},
         |clu AS (SELECT id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY id),
         |toks AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
         |         FROM documents),
         |labeled AS (
         |  SELECT t.doc_id, COALESCE(c.cluster_id, t.doc_id) AS cluster_id, t.n_tokens
         |  FROM toks t LEFT JOIN clu c ON t.doc_id = c.id)
         |SELECT cluster_id, doc_id AS keep_id, n_tokens FROM (
         |  SELECT cluster_id, doc_id, n_tokens,
         |         row_number() OVER (PARTITION BY cluster_id
         |                            ORDER BY n_tokens DESC, doc_id) AS rn
         |  FROM labeled) t
         |WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val clusters = NearDupQueries.nearDupClusters(spark, dir)
      val toks = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val labeled = toks
        .join(clusters, toks("doc_id") === clusters("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          col("n_tokens"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      labeled.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("keep_id"), col("n_tokens"))
        .orderBy(col("cluster_id"))
    },

    // HYBRID doc<->embedding dedup: near-dup edges from BOTH
    // modalities — text (MinHash-LSH + Jaccard verify, q23's rules)
    // and embedding space (label-blocked cosine >= 0.4, q36's rules,
    // under the fixture convention doc i's embedding is vec i where
    // one exists) — unioned into ONE graph before the transitive
    // closure. This is the production shape: a paraphrase caught only
    // by embeddings and a boilerplate copy caught only by text land
    // in the SAME cluster, so keep-best (q72's window) can never keep
    // two documents that any modality considers duplicates. The
    // oracle recomputes both edge sets independently and closes them
    // with one recursive CTE.
    //
    // SCALE BOUNDARY (measured, TIMINGS_sf10): the embedding edge
    // source here is the q36 label-BLOCKED all-pairs rule, quadratic
    // within a label block — 70x wall for 10x data at sf10. The
    // production embedding-dedup route at corpus scale is the
    // IVF-CELL-scoped SemDeDup (q118: pairs bounded per cell,
    // degenerate-cell cap), which composes with this same closure;
    // the label rule is kept here because the oracle pins
    // cross-modality cluster identity on the fixture convention.
    QueryDef("q81_hybrid_dedup_clusters",
      s"""WITH RECURSIVE ${NearDupQueries.sigCte.stripPrefix("WITH ")},
         |${NearDupQueries.bandsCte},
         |${NearDupQueries.candPairsCte},
         |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n2 AS (SELECT vec_id, v,
         |              sqrt(list_aggregate([x*x for x in v], 'sum')) AS nrm FROM emb),
         |lbl AS (SELECT vec_id, label FROM embeddings),
         |epairs AS (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM n2 a JOIN lbl la ON a.vec_id = la.vec_id
         |       JOIN lbl lb ON la.label = lb.label
         |       JOIN n2 b ON b.vec_id = lb.vec_id AND a.vec_id < b.vec_id
         |  WHERE list_aggregate([a.v[i]*b.v[i]
         |                        for i in generate_series(1, ${SimilarityQueries.Dim})], 'sum')
         |          / (a.nrm*b.nrm) >= ${SimilarityQueries.BlockedNearDupThreshold}
         |    AND a.vec_id IN (SELECT doc_id FROM documents)
         |    AND b.vec_id IN (SELECT doc_id FROM documents)),
         |hedges AS (
         |  SELECT doc_a AS id, doc_b AS nb FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |  UNION SELECT doc_a, doc_b FROM epairs
         |  UNION SELECT doc_b, doc_a FROM epairs),
         |hreach(id, r) AS (
         |  SELECT id, id FROM (SELECT DISTINCT id FROM hedges) z
         |  UNION
         |  SELECT e2.id, hreach.r FROM hedges e2 JOIN hreach ON e2.nb = hreach.id)
         |SELECT id, min(r)::BIGINT AS cluster_id FROM hreach GROUP BY id
         |ORDER BY id""".stripMargin) { (spark, dir) =>
      val text = NearDupQueries.verifiedPairs(spark, dir)
        .select(col("doc_a"), col("doc_b"))
      val docIds = Tables.load(spark, dir, "documents").select(col("doc_id"))
      // embedding edges restricted to ids that ARE documents (the
      // doc_id = vec_id fixture mapping; at sf0.1 only 2000 of 5000
      // docs carry an embedding)
      val emb = SimilarityQueries.embeddingNearDup(spark, dir)
        .select(col("id_a"), col("id_b"))
        .join(docIds.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
        .join(docIds.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      NearDupQueries.clustersFromPairs(text.unionByName(emb).distinct())
    },

    // The SCALE-PATH hybrid closure: the same cross-modality cluster
    // semantics as q81, with the embedding edge source swapped from
    // the fixture's label-blocked all-pairs rule (quadratic within a
    // block — measured 70x wall for 10x data at sf10, TIMINGS_sf10)
    // to the IVF-CELL-scoped SemDeDup pairs (q118's rules: pairs
    // bounded per cell by the k-means partition, degenerate-cell
    // cap available). This is the composition a 100 TB pipeline
    // actually runs: one persisted clustering feeds ANN serving,
    // semantic dedup AND the hybrid closure; every join is an
    // equi-join (LSH bands for text, cid for embeddings), so edge
    // generation stays shuffle-bounded at any corpus size. The
    // oracle recomputes both edge sets independently (the MinHash
    // chain and the 2-round-Lloyd IVF chain) and closes them with
    // one recursive CTE.
    QueryDef("q195_hybrid_closure_scaled",
      s"""WITH RECURSIVE ${NearDupQueries.sigCte.stripPrefix("WITH ")},
         |${NearDupQueries.bandsCte},
         |${NearDupQueries.candPairsCte},
         |${SimilarityQueries.normedCte.stripPrefix("WITH ")},
         |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < ${SimilarityQueries.NumCentroids}),
         |${SimilarityQueries.ivfAssignSql("c0", "a0")},
         |${SimilarityQueries.ivfLloydSql("a0", "c1")},
         |${SimilarityQueries.ivfAssignSql("c1", "a1")},
         |${SimilarityQueries.ivfLloydSql("a1", "c2")},
         |${SimilarityQueries.ivfAssignSql("c2", "cell")},
         |spairs AS (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM cell a JOIN cell b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE list_aggregate([a.v[i]*b.v[i]
         |                        for i in generate_series(1, ${SimilarityQueries.Dim})], 'sum')
         |          / (a.nrm*b.nrm) > ${CurationQueries.semTau}
         |    AND a.vec_id IN (SELECT doc_id FROM documents)
         |    AND b.vec_id IN (SELECT doc_id FROM documents)),
         |hedges AS (
         |  SELECT doc_a AS id, doc_b AS nb FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |  UNION SELECT doc_a, doc_b FROM spairs
         |  UNION SELECT doc_b, doc_a FROM spairs),
         |hreach(id, r) AS (
         |  SELECT id, id FROM (SELECT DISTINCT id FROM hedges) z
         |  UNION
         |  SELECT e2.id, hreach.r FROM hedges e2 JOIN hreach ON e2.nb = hreach.id)
         |SELECT id, min(r)::BIGINT AS cluster_id FROM hreach GROUP BY id
         |ORDER BY id""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      val text = NearDupQueries.verifiedPairs(spark, dir)
        .select(col("doc_a"), col("doc_b"))
      val docIds = Tables.load(spark, dir, "documents").select(col("doc_id"))
      val assigned = SimilarityQueries.ivfIndex(spark, dir)
      val sem = graft.operators.SemanticDedup
        .pairs(assigned, CurationQueries.semTau)
        .select(col("ia").as("doc_a"), col("ib").as("doc_b"))
        .join(docIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(docIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      NearDupQueries.clustersFromPairs(text.unionByName(sem).distinct())
    },

    // Deterministic train/val/test split: fold = f(seed, doc_id) only
    // — stable under reprocessing/growth, leak-proof per id, zero
    // shuffle (one codegen'd hash expression; the oracle replays the
    // exact md5-slice arithmetic). The gate pins counts AND exact
    // per-fold id extremes + id sums, so a single reassigned id fails.
    QueryDef("q100_hash_split",
      """SELECT fold, count(*)::BIGINT AS n_docs,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id,
        |       sum(doc_id)::BIGINT AS id_sum
        |FROM (SELECT doc_id,
        |             CASE WHEN bp < 8000 THEN 'train'
        |                  WHEN bp < 9000 THEN 'val'
        |                  ELSE 'test' END AS fold
        |      FROM (SELECT doc_id,
        |                   ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS bp
        |            FROM documents))
        |GROUP BY fold ORDER BY fold""".stripMargin) { (spark, dir) =>
      graft.operators.DataSplit
        .withFold(Tables.load(spark, dir, "documents"), "doc_id", "42")
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("fold"))
    },

    // Deterministic stratified downsampling: cap English at 25% and
    // Chinese at 50%, keep everything else — the corpus-rebalancing
    // pass before training. Keep/drop = f(seed, doc_id) only (stable
    // under reprocessing and growth, map-only plan); the oracle
    // replays the md5 basis-point arithmetic and the per-stratum CASE.
    QueryDef("q102_stratified_sample",
      """SELECT lang, count(*)::BIGINT AS n_kept,
        |       sum(doc_id)::BIGINT AS id_sum,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (SELECT doc_id, lang,
        |             ('0x' || substr(md5('s7:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS bp
        |      FROM documents)
        |WHERE bp < CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE 10000 END
        |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      graft.operators.StratifiedSample
        .sampleBy(Tables.load(spark, dir, "documents"), "doc_id", "lang",
          Map("en" -> 2500, "zh" -> 5000), defaultBp = 10000, seed = "s7")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    },

    // Token-budget sequence packing: shard by the deterministic id
    // hash, then contiguous 1500-token bins within each shard
    // (running BIGINT sum in ascending doc_id order; bin = start
    // offset DIV budget). All-integer arithmetic, so the oracle
    // replays the exact assignment; the gate pins per-(shard, bin)
    // doc counts, token totals, and the id extremes — one document
    // in a different bin fails the compare.
    QueryDef("q104_sequence_pack",
      """WITH t AS (
        |  SELECT doc_id,
        |         len(string_split(text, ' '))::BIGINT AS n_tokens,
        |         (('0x' || substr(md5('pk:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000) % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT shard, CAST((cum - n_tokens) // 1500 AS BIGINT) AS bin,
        |       count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS bin_tokens,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.SequencePack
        .assignBins(docs, "doc_id", "n_tokens",
          numShards = 8, budgetTokens = 1500L, seed = "pk")
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("shard"), col("bin"))
    },

    // The END-TO-END training-corpus materialization, every stage an
    // already-gated operator, composed in production order: clean
    // (quality → exact dedup → near-dup drop, the q44 chain verbatim)
    // → fold assignment (q100's split) → stratified rebalance (q102's
    // rates) → fold-pure sequence packing (q104, folds as packing
    // boundaries). The gate pins per-(fold, shard) doc counts, bin
    // counts, token totals and id sums — one document surviving,
    // folding, sampling or packing differently anywhere in the chain
    // fails the compare.
    QueryDef("q107_training_corpus",
      s"""${NearDupQueries.sigCte},
         |${NearDupQueries.bandsCte},
         |$survivorsCte,
         |folded AS (
         |  SELECT doc_id, lang, text,
         |         CASE WHEN bp < 8000 THEN 'train'
         |              WHEN bp < 9000 THEN 'val'
         |              ELSE 'test' END AS fold
         |  FROM (SELECT *,
         |          ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS bp
         |        FROM surv) f),
         |sampled AS (
         |  SELECT doc_id, lang, text, fold FROM (
         |    SELECT *,
         |           ('0x' || substr(md5('s7:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS sbp
         |    FROM folded) s
         |  WHERE sbp < CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE 10000 END),
         |t AS (
         |  SELECT doc_id, fold,
         |         len(string_split(text, ' '))::BIGINT AS n_tokens,
         |         (('0x' || substr(md5('pk:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000) % 4 AS shard
         |  FROM sampled),
         |c AS (
         |  SELECT doc_id, fold, shard, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY fold, shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT fold, shard, count(*)::BIGINT AS n_docs,
         |       CAST(count(DISTINCT CAST((cum - n_tokens) // 1500 AS BIGINT)) AS BIGINT) AS n_bins,
         |       sum(n_tokens)::BIGINT AS fold_tokens,
         |       sum(doc_id)::BIGINT AS id_sum
         |FROM c GROUP BY fold, shard ORDER BY fold, shard""".stripMargin) { (spark, dir) =>
      val surv = cleanSurvivors(spark, dir)
      val folded = graft.operators.DataSplit.withFold(surv, "doc_id", "42")
      val sampled = graft.operators.StratifiedSample.sampleBy(
        folded, "doc_id", "lang", Map("en" -> 2500, "zh" -> 5000),
        defaultBp = 10000, seed = "s7")
      val toks = sampled.select(col("doc_id"), col("fold"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.SequencePack
        .assignBins(toks, "doc_id", "n_tokens",
          numShards = 4, budgetTokens = 1500L, seed = "pk",
          groupCols = Seq("fold"))
        .groupBy(col("fold"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("bin")).as("n_bins"),
          sum(col("n_tokens")).as("fold_tokens"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("fold"), col("shard"))
    },

    // Sliding-window chunking: documents → fixed-size overlapping
    // token windows (size 16, stride 12 on the ~50-token fixture;
    // the production setting is the model context length). The gate
    // compares FULL chunk text row-for-row — a chunk boundary off by
    // one token anywhere fails the hash. Map-only plan: zero
    // exchanges, integer-only window arithmetic the oracle replays
    // (ChunkerSpec pins the no-Exchange plan + coverage invariants).
    QueryDef("q138_doc_chunks",
      """WITH s AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |         len(string_split(text, ' '))::BIGINT AS dl
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, t, dl,
        |         unnest(range(0, ((greatest(dl - 16, 0) + 11) // 12) + 1)) AS i
        |  FROM s)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |       len(t[i*12 + 1 : least(i*12 + 16, dl)])::BIGINT AS n_tok,
        |       array_to_string(t[i*12 + 1 : least(i*12 + 16, dl)], ' ') AS chunk
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
      graft.operators.Chunker
        .chunks(Tables.load(spark, dir, "documents"), "doc_id",
          split(col("text"), " "), size = 16, stride = 12)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Split-leakage audit: a val/test document that is a NEAR-DUP of
    // a train document leaks the training set into evaluation even
    // though exact dedup and the hash split both did their jobs. The
    // audit composes two already-gated stages — the q100 fold
    // assignment and the q23 Jaccard-verified near-dup pairs — and
    // counts eval docs with a train partner. Scale shape: folds are a
    // map-only hash label; pairs come from the banded-LSH chain
    // (shuffle-bounded, never all-pairs); the leak check is one
    // semi-join of the (small) pair list against train ids plus one
    // doc_id join back — the corpus itself never re-shuffles.
    QueryDef("q141_split_leakage",
      s"""${NearDupQueries.sigCte},
         |${NearDupQueries.bandsCte},
         |${NearDupQueries.candPairsCte},
         |folds AS (
         |  SELECT doc_id,
         |         CASE WHEN bp < 8000 THEN 'train'
         |              WHEN bp < 9000 THEN 'val'
         |              ELSE 'test' END AS fold
         |  FROM (SELECT doc_id,
         |               ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS bp
         |        FROM documents)),
         |e AS (SELECT doc_a AS x, doc_b AS y FROM pairs
         |      UNION ALL SELECT doc_b, doc_a FROM pairs),
         |leaky AS (
         |  SELECT DISTINCT e.x AS doc_id
         |  FROM e JOIN folds fy ON e.y = fy.doc_id
         |  WHERE fy.fold = 'train')
         |SELECT fold, count(*)::BIGINT AS n_docs,
         |       sum(CASE WHEN l.doc_id IS NOT NULL AND fold IN ('val', 'test')
         |                THEN 1 ELSE 0 END)::BIGINT AS n_leaky,
         |       sum(CASE WHEN l.doc_id IS NOT NULL AND fold IN ('val', 'test')
         |                THEN f.doc_id ELSE 0 END)::BIGINT AS leaky_id_sum
         |FROM folds f LEFT JOIN leaky l USING (doc_id)
         |GROUP BY fold ORDER BY fold""".stripMargin) { (spark, dir) =>
      val folds = graft.operators.DataSplit
        .withFold(Tables.load(spark, dir, "documents").select(col("doc_id")),
          "doc_id", "42")
      val pairs = NearDupQueries.verifiedPairs(spark, dir)
        .select(col("doc_a"), col("doc_b"))
      val e = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
        .union(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
      val trainIds = folds.where(col("fold") === "train")
        .select(col("doc_id").as("y"))
      val leaky = e.join(trainIds, Seq("y"), "left_semi")
        .select(col("x").as("doc_id")).distinct()
        .withColumn("leak", lit(1L))
      val evalFold = col("fold").isin("val", "test")
      folds.join(leaky, Seq("doc_id"), "left_outer")
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("leak").isNotNull && evalFold, 1L).otherwise(0L))
            .as("n_leaky"),
          sum(when(col("leak").isNotNull && evalFold, col("doc_id"))
            .otherwise(0L)).as("leaky_id_sum"))
        .orderBy(col("fold"))
    },

    // Incremental MATERIALIZED-VIEW maintenance: the per-(lang, source)
    // summary table is maintained by folding the DELTA batch's
    // aggregate into the existing summary — every measure here is a
    // mergeable state (counts/sums add, max of maxes), so the refresh
    // touches one summary-sized union + re-agg and NEVER re-scans
    // history. That is how a 100 TB corpus keeps its dashboards
    // current (non-mergeable measures route to sketches: exact
    // distinct -> q153's HLL, quantiles -> q112's grid). The gate
    // demands fold(base 75%, delta 25%) == direct full aggregate,
    // hash-exact.
    QueryDef("q158_matview_maintain",
      """SELECT lang, source, count(*)::BIGINT AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       sum(doc_id)::BIGINT AS id_sum,
        |       max(length(text))::BIGINT AS max_len
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
      def summarize(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
            sum(col("doc_id")).as("id_sum"),
            max(length(col("text"))).cast("long").as("max_len"))
      val docs = Tables.load(spark, dir, "documents")
      val base = summarize(docs.where(col("doc_id") % 4 =!= 0))
      val delta = summarize(docs.where(col("doc_id") % 4 === 0))
      base.union(delta)
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("id_sum")).as("id_sum"),
          max(col("max_len")).as("max_len"))
        .orderBy(col("lang"), col("source"))
    },

    // Cross-replica ANTI-ENTROPY audit: compare two copies of a table
    // by BUCKET-level content fingerprints — each side folds
    // md5(id:text) into an order-free per-bucket sum, and only
    // divergent buckets surface. At 100 TB this is how replicas are
    // reconciled: each site computes its own bucket digests locally
    // (one partial-agg'd scan), the comparison joins two
    // bucket-count-sized digest tables, and re-sync fetches ONLY the
    // divergent buckets instead of re-copying the table. The "replica"
    // here injects a deterministic corruption (every 97th doc's text
    // perturbed) so the gate proves divergent buckets are found
    // exactly — and nothing else is.
    QueryDef("q163_replica_audit",
      """WITH a AS (
        |  SELECT (doc_id // 64)::BIGINT AS bucket,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12))::BIGINT AS fp
        |  FROM documents),
        |b AS (
        |  SELECT (doc_id // 64)::BIGINT AS bucket,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |            CASE WHEN doc_id % 97 = 0 THEN text || '!' ELSE text END), 1, 12))::BIGINT AS fp
        |  FROM documents),
        |da AS (SELECT bucket, sum(fp)::BIGINT AS digest, count(*)::BIGINT AS n FROM a GROUP BY 1),
        |db AS (SELECT bucket, sum(fp)::BIGINT AS digest, count(*)::BIGINT AS n FROM b GROUP BY 1)
        |SELECT da.bucket, da.n AS n_rows,
        |       (da.digest <> db.digest) AS diverged
        |FROM da JOIN db ON da.bucket = db.bucket
        |WHERE da.digest <> db.digest OR da.n <> db.n
        |ORDER BY da.bucket""".stripMargin) { (spark, dir) =>
      def digests(mutate: Boolean) = {
        val text =
          if (mutate) when(col("doc_id") % 97 === 0, concat(col("text"), lit("!")))
            .otherwise(col("text"))
          else col("text")
        Tables.load(spark, dir, "documents")
          .select(expr("doc_id DIV 64").as("bucket"),
            conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"), text)),
              1, 12), 16, 10).cast("long").as("fp"))
          .groupBy(col("bucket"))
          .agg(sum(col("fp")).as("digest"), count(lit(1)).as("n"))
      }
      val da = digests(mutate = false)
      val db = digests(mutate = true)
        .select(col("bucket"), col("digest").as("digest_b"), col("n").as("n_b"))
      da.join(db, "bucket")
        .where(col("digest") =!= col("digest_b") || col("n") =!= col("n_b"))
        .select(col("bucket"), col("n").as("n_rows"),
          (col("digest") =!= col("digest_b")).as("diverged"))
        .orderBy(col("bucket"))
    },

    // K-FOLD cross-validation assignment (the evaluation-protocol
    // sibling of q100's train/val/test split): fold i ∈ [0, 5) from
    // the same replayable md5-slice family — stable under
    // reprocessing, leak-proof per id, map-only. The gate pins every
    // fold's census (count + id sum + extremes) so ONE reassigned id
    // fails; coverage and disjointness are structural (each id
    // computes exactly one fold, and the fold counts sum to the
    // corpus under the shared oracle replay).
    QueryDef("q252_kfold_split",
      """SELECT fold, count(*)::BIGINT AS n_docs,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id,
        |       sum(doc_id)::BIGINT AS id_sum
        |FROM (SELECT doc_id,
        |             CAST(('0x' || substr(md5('cv7:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 5 AS INT) AS fold
        |      FROM documents)
        |GROUP BY fold ORDER BY fold""".stripMargin) { (spark, dir) =>
      graft.operators.DataSplit
        .withKFold(Tables.load(spark, dir, "documents"), "doc_id", "cv7", 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("fold"))
    },

    // RENDEZVOUS (highest-random-weight) SHARD ASSIGNMENT + the
    // minimal-movement rebalance audit: every doc goes to
    // argmax_shard md5(doc:shard), for 8 shards and again for 9. HRW's
    // defining property — adding a shard moves ONLY the docs whose
    // new argmax IS the new shard (expected 1/9; nothing reshuffles
    // between survivors) — is emitted as data: per-shard old/new
    // counts plus arrivals, and the shard=-1 summary's n_arrived
    // counts moved-docs-that-did-NOT-land-on-shard-8, which HRW
    // guarantees is ZERO (both engines compute it; the oracle hash
    // pins it). This is how a 100 TB ANN/posting index grows capacity
    // without a full re-shard: assignment is a per-row O(shards)
    // expression, map-only — no coordination state anywhere.
    QueryDef("q284_rendezvous_shards",
      """WITH sh AS (SELECT unnest(generate_series(0, 8)) AS shard),
        |hk AS (SELECT doc_id, shard,
        |             ('0x' || substr(md5('rdv:' || CAST(doc_id AS VARCHAR) || ':' || CAST(shard AS VARCHAR)), 1, 15))::BIGINT AS w
        |       FROM documents CROSS JOIN sh),
        |a8 AS (SELECT doc_id, shard AS s8 FROM (
        |         SELECT doc_id, shard,
        |                row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, shard) AS rn
        |         FROM hk WHERE shard < 8) t WHERE rn = 1),
        |a9 AS (SELECT doc_id, shard AS s9 FROM (
        |         SELECT doc_id, shard,
        |                row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, shard) AS rn
        |         FROM hk) t WHERE rn = 1),
        |mv AS (SELECT a8.doc_id, s8, s9 FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id),
        |per AS (SELECT s9 AS shard,
        |               CAST(sum(CASE WHEN s8 = s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_stayed,
        |               count(*)::BIGINT AS n_new,
        |               CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_arrived
        |        FROM mv GROUP BY s9),
        |tot AS (SELECT CAST(-1 AS BIGINT) AS shard,
        |               CAST(sum(CASE WHEN s8 = s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_stayed,
        |               count(*)::BIGINT AS n_new,
        |               CAST(sum(CASE WHEN s8 <> s9 AND s9 <> 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_arrived
        |        FROM mv)
        |SELECT CAST(shard AS BIGINT) AS shard, n_stayed, n_new, n_arrived
        |FROM (SELECT * FROM per UNION ALL SELECT * FROM tot) u
        |ORDER BY shard""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents").select(col("doc_id"))
      // per-row O(shards) argmax — ONE fold expression, no explode, no
      // window, no join: the assignment is embarrassingly map-only
      // (strict > keeps the first = lowest shard on hash ties, the
      // oracle's ORDER BY w DESC, shard tie-break)
      val wexp = (s: Column) =>
        conv(substring(md5(concat(lit("rdv:"), col("doc_id").cast("string"),
          lit(":"), s.cast("string"))), 1, 15), 16, 10).cast("long")
      def amax(hi: Int): Column = aggregate(
        sequence(lit(0), lit(hi)),
        struct(lit(-1L).as("w"), lit(-1L).as("s")),
        (acc, s) => {
          val wv = wexp(s)
          when(wv > acc("w"),
            struct(wv.as("w"), s.cast("long").as("s"))).otherwise(acc)
        })("s")
      val mv = docs.select(col("doc_id"), amax(7).as("s8"), amax(8).as("s9"))
      val per = mv.groupBy(col("s9").as("shard"))
        .agg(sum(when(col("s8") === col("s9"), 1L).otherwise(0L)).as("n_stayed"),
          count(lit(1)).as("n_new"),
          sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("n_arrived"))
      val tot = mv.agg(
          sum(when(col("s8") === col("s9"), 1L).otherwise(0L)).as("n_stayed"),
          count(lit(1)).as("n_new"),
          sum(when(col("s8") =!= col("s9") && col("s9") =!= 8, 1L).otherwise(0L))
            .as("n_arrived"))
        .select(lit(-1L).as("shard"), col("n_stayed"), col("n_new"),
          col("n_arrived"))
      per.select(col("shard").cast("long"), col("n_stayed"), col("n_new"),
          col("n_arrived"))
        .unionByName(tot).orderBy(col("shard"))
    },

    // GROUP-AWARE train/val/test split: folds assigned by
    // md5(seed:SOURCE), not doc id — the constructive fix for the
    // leakage q141/q219 AUDIT: near-duplicates cluster within a
    // source, so a doc-grain split leaks them across train/test while
    // the group-grain split provably cannot (one source → one fold is
    // structural: fold is a pure function of source). The gate emits
    // per-fold doc AND distinct-source counts; Σ n_sources over folds
    // equals the global distinct-source count exactly BECAUSE no
    // source spans folds — both engines compute it, the hash pins it.
    // Same scale contract as q100: a per-row hash expression, zero
    // shuffle beyond the audit aggregation.
    QueryDef("q289_group_split",
      """SELECT fold, count(*)::BIGINT AS n_docs,
        |       count(DISTINCT source)::BIGINT AS n_sources,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (SELECT doc_id, source,
        |             CASE WHEN bp < 8000 THEN 'train'
        |                  WHEN bp < 9000 THEN 'val'
        |                  ELSE 'test' END AS fold
        |      FROM (SELECT doc_id, source,
        |                   ('0x' || substr(md5('g42:' || source), 1, 7))::BIGINT % 10000 AS bp
        |            FROM documents))
        |GROUP BY fold ORDER BY fold""".stripMargin) { (spark, dir) =>
      graft.operators.DataSplit
        .withFold(Tables.load(spark, dir, "documents"), "source", "g42")
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("fold"))
    }
  )
}
