package graft.queries

import graft.functions.{GraftFunctions, PiiScrub, RepetitionStats}
import graft.operators.{C4Rules, DataSplit, Decontaminate, DomainMix, SemanticDedup, SubstringDedup}
import graft.sources.Tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production LLM-data pipeline runs that
  * no earlier gate covers (SURVEY §2.3 extensions): benchmark
  * decontamination, PII scrubbing, semantic (embedding-space) dedup,
  * domain-mixture rebalancing, and Gopher-style repetition quality
  * rules. Each gate pins integer-exact semantics a DuckDB oracle
  * replays bit-for-bit; the scale arguments live with the operators
  * ([[graft.operators.Decontaminate]], [[graft.operators.DomainMix]],
  * [[graft.operators.SemanticDedup]], [[graft.functions.PiiScrub]],
  * [[graft.functions.RepetitionStats]]).
  */
object CurationQueries {

  /** Fixture eval-set rule: every 5th document "is a benchmark". */
  private[queries] val EvalMod = 5
  /** Exact-overlap gram width (the 100 TB setting is ~13; 8 keeps the
    * fixture's near-dup partners detectable while natural collisions
    * stay zero — see PLANS.md round 7). */
  private[queries] val NGram = 8

  /** Contaminated train-doc ids (benchmark n-gram hits), memoized per
    * (session, dir): the q116 metric gate and the q193 release chain
    * consume the SAME frame, so the n-gram sweep runs once per
    * session — the IndexStore discipline (corpus-wide artifacts are
    * computed once; consumers read them). */
  private[queries] def contamIds(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    FrameMemo.memoized(spark, s"contam:$dir") {
      val docs = Tables.loadParallel(spark, dir, "documents")
      val evalSet = docs.where(col("doc_id") % EvalMod === 0)
      val train = docs.where(col("doc_id") % EvalMod =!= 0)
      Decontaminate.contaminatedIds(train, evalSet, "doc_id", "text",
        NGram)
    }

  private[queries] val DupTokenPct = 60
  private[queries] val TopGram2Pct = 10

  private[queries] val MixSeed = "mix7"
  private[queries] val MixDenom = 2

  /** q199 bloom-prefilter sizing: 8 Mbit / 5 hashes (a 1 MB literal)
    * holds even the sf0.1 eval-gram set (~900k distinct grams) below
    * the 1% false-positive knee — the earlier 64 Kbit setting
    * SATURATED at sf0.1, passing every doc to the exact verify and
    * silently degrading the gate to double work. Bits scale with the
    * EVAL corpus (small by construction), never the training corpus;
    * the filter ships as a literal, so size costs one driver-side
    * buffer, not a per-row copy. */
  private[queries] val BloomBits = 1 << 23
  private[queries] val BloomHashes = 5

  private[queries] val DsirBuckets = graft.operators.Dsir.DefaultBuckets
  private[queries] val DsirTargetLang = "en"
  private[queries] val DsirSeed = "g17"
  private[queries] val DsirK = 100

  // ---- q116: benchmark decontamination -------------------------------

  private val decontaminateSql =
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, array_to_string(t[i.i:i.i+${NGram - 1}], ' ') AS g
       |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t)-${NGram - 2})) AS i) i
       |  WHERE len(t) >= $NGram),
       |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % $EvalMod = 0),
       |contam AS (SELECT DISTINCT doc_id FROM grams
       |           WHERE doc_id % $EvalMod <> 0 AND g IN (SELECT g FROM ev)),
       |train AS (SELECT doc_id, lang FROM documents WHERE doc_id % $EvalMod <> 0)
       |SELECT lang,
       |       count(*)::BIGINT AS n_train,
       |       sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
       |       sum(CASE WHEN c.doc_id IS NULL THEN t.doc_id ELSE 0 END)::BIGINT AS kept_id_sum
       |FROM train t LEFT JOIN contam c ON t.doc_id = c.doc_id
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q199: bloom-broadcast decontamination --------------------------

  /** Oracle: the PLAIN exact n-gram contamination rule, grouped by
    * language — bloom admits every true collision (no false
    * negatives) and the exact verify removes its false positives, so
    * the prefilter must be invisible in the result (the q69
    * bloom-semi-join argument, applied to decontamination). */
  private val bloomDecontSql =
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, array_to_string(t[i.i:i.i+${NGram - 1}], ' ') AS g
       |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t)-${NGram - 2})) AS i) i
       |  WHERE len(t) >= $NGram),
       |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % $EvalMod = 0),
       |contam AS (SELECT DISTINCT doc_id FROM grams
       |           WHERE doc_id % $EvalMod <> 0 AND g IN (SELECT g FROM ev))
       |SELECT d.lang, count(*)::BIGINT AS n_contaminated,
       |       sum(d.doc_id)::BIGINT AS contam_id_sum
       |FROM contam c JOIN documents d ON c.doc_id = d.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // ---- q197: C4 line-level cleaning -----------------------------------

  /** Deterministic line planting — the fixture text is single-line
    * and punctuation-free, so (exactly like q117's PII augmentation)
    * both engines apply the SAME augmentation expression: ' merge '
    * becomes a sentence break, and every doc_id residue class plants
    * one rule-triggering line (lorem-ipsum doc drop, javascript line
    * drop, curly-brace doc drop, short unterminated line). */
  private val c4Sql =
    s"""WITH aug AS (
       |  SELECT doc_id, lang,
       |         replace(text, ' merge ', '.' || chr(10)) ||
       |         CASE doc_id % 7
       |           WHEN 0 THEN chr(10) || 'lorem ipsum dolor sit amet.'
       |           WHEN 1 THEN chr(10) || 'you must enable javascript to view this page.'
       |           WHEN 2 THEN chr(10) || 'if (config) { render(); }'
       |           WHEN 3 THEN chr(10) || 'read more'
       |           ELSE '' END AS t
       |  FROM documents),
       |doc AS (
       |  SELECT doc_id, lang,
       |         (contains(t, 'lorem ipsum') OR contains(t, '{')) AS bad,
       |         list_filter(string_split(t, chr(10)),
       |           x -> x LIKE '%.' AND len(string_split(x, ' ')) >= ${C4Rules.MinWords}
       |                AND NOT contains(x, 'javascript')) AS kl
       |  FROM aug),
       |st AS (
       |  SELECT doc_id, lang, bad, len(kl) AS n_lines,
       |         CASE WHEN NOT bad AND len(kl) >= ${C4Rules.MinLines} THEN 1 ELSE 0 END AS kept,
       |         CASE WHEN NOT bad AND len(kl) >= ${C4Rules.MinLines}
       |              THEN length(array_to_string(kl, chr(10))) ELSE 0 END AS n_chars
       |  FROM doc)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN bad THEN 1 ELSE 0 END)::BIGINT AS n_doc_drops,
       |       sum(CASE WHEN NOT bad AND kept = 0 THEN 1 ELSE 0 END)::BIGINT AS n_starved,
       |       sum(kept)::BIGINT AS n_kept,
       |       sum(CASE WHEN kept = 1 THEN n_lines ELSE 0 END)::BIGINT AS lines_kept,
       |       sum(n_chars)::BIGINT AS chars_kept,
       |       sum(CASE WHEN kept = 1 THEN doc_id ELSE 0 END)::BIGINT AS kept_id_sum
       |FROM st GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q117: PII scrub ------------------------------------------------

  /** Deterministic PII planting — the fixture text is synthetic and
    * PII-free, so both engines append the same synthetic contact
    * strings keyed on doc_id; what the gate tests is the DETECTION
    * and REDACTION arithmetic downstream, which runs on the combined
    * text exactly as it would on a real crawl. */
  private[queries] def augmented(textCol: Column, id: Column): Column = concat(
    textCol,
    when(id % 3 === 0,
      concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
      .otherwise(""),
    when(id % 7 === 0,
      concat(lit(" call 555-"), lpad((id % 10000).cast("string"), 4, "0")))
      .otherwise(""),
    when(id % 11 === 0,
      concat(lit(" host 10."), (id % 256).cast("string"), lit(".0."),
        ((id * 7) % 256).cast("string")))
      .otherwise(""))

  private val piiSql =
    """WITH aug AS (
      |  SELECT doc_id, lang,
      |         text
      |         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      |         || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
      |         || CASE WHEN doc_id % 11 = 0 THEN ' host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) ELSE '' END
      |         AS text
      |  FROM documents),
      |hits AS (
      |  SELECT doc_id, lang,
      |         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
      |         len(regexp_extract_all(text, '\b\d{3}-\d{4}\b'))::BIGINT AS n_phone,
      |         len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
      |         length(regexp_replace(regexp_replace(regexp_replace(text,
      |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |           '\b\d{3}-\d{4}\b', '<PHONE>', 'g'))::BIGINT AS redacted_len
      |  FROM aug)
      |SELECT lang, count(*)::BIGINT AS n_docs,
      |       sum(n_email)::BIGINT AS n_email, sum(n_phone)::BIGINT AS n_phone,
      |       sum(n_ip)::BIGINT AS n_ip,
      |       sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_with_pii,
      |       sum(redacted_len)::BIGINT AS sum_redacted_len
      |FROM hits GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q118: semantic dedup ------------------------------------------

  /** Threshold shared with the q36/q81 embedding-edge rule
    * ([[SimilarityQueries.BlockedNearDupThreshold]]) so one tuning
    * constant governs every embedding near-dup gate. */
  private[queries] def semTau = SimilarityQueries.BlockedNearDupThreshold

  private val semanticDedupSql = {
    val dim = SimilarityQueries.Dim
    s"""${SimilarityQueries.normedCte},
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < ${SimilarityQueries.NumCentroids}),
       |${SimilarityQueries.ivfAssignSql("c0", "a0")},
       |${SimilarityQueries.ivfLloydSql("a0", "c1")},
       |${SimilarityQueries.ivfAssignSql("c1", "a1")},
       |${SimilarityQueries.ivfLloydSql("a1", "c2")},
       |${SimilarityQueries.ivfAssignSql("c2", "cell")},
       |pairs AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib
       |  FROM cell a JOIN cell b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_aggregate([a.v[i]*b.v[i] for i in generate_series(1, $dim)], 'sum')
       |          / (a.nrm*b.nrm) > $semTau),
       |dropped AS (SELECT DISTINCT ib FROM pairs)
       |SELECT c.vec_id, c.cid FROM cell c JOIN dropped d ON c.vec_id = d.ib
       |ORDER BY c.vec_id""".stripMargin
  }

  // ---- q119: domain mixture ------------------------------------------

  private val domainMixSql =
    s"""WITH toks AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tok
       |              FROM documents),
       |tot AS (SELECT sum(n_tok)::BIGINT AS all_tok, count(DISTINCT source)::BIGINT AS n_src
       |        FROM toks),
       |dom AS (SELECT source, count(*)::BIGINT AS n_total, sum(n_tok)::BIGINT AS dom_weight
       |        FROM toks GROUP BY source),
       |rated AS (
       |  SELECT d.source, d.n_total, d.dom_weight,
       |         least(10000, (10000 * (t.all_tok // ($MixDenom * t.n_src))) // d.dom_weight)::BIGINT AS rate_bp
       |  FROM dom d CROSS JOIN tot t),
       |kept AS (
       |  SELECT tk.source, tk.doc_id, tk.n_tok
       |  FROM toks tk JOIN rated r ON tk.source = r.source
       |  WHERE ('0x' || substr(md5('$MixSeed:' || CAST(tk.doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 < r.rate_bp)
       |SELECT r.source, r.n_total, r.dom_weight, r.rate_bp,
       |       count(k.doc_id)::BIGINT AS n_kept,
       |       COALESCE(sum(k.n_tok), 0)::BIGINT AS tok_kept,
       |       COALESCE(sum(k.doc_id), 0)::BIGINT AS kept_id_sum
       |FROM rated r LEFT JOIN kept k ON r.source = k.source
       |GROUP BY r.source, r.n_total, r.dom_weight, r.rate_bp
       |ORDER BY r.source""".stripMargin

  /** q180 oracle: q119's shape with the α = 0.5 temperature budget —
    * per-domain share ∝ floor(sqrt(dom_weight)) of the same total
    * target. floor(sqrt) of BIGINTs below 2⁵² is exact in both
    * engines (see [[graft.operators.DomainMix.temperatureRates]]). */
  private val temperatureMixSql =
    s"""WITH toks AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tok
       |              FROM documents),
       |dom AS (SELECT source, count(*)::BIGINT AS n_total, sum(n_tok)::BIGINT AS dom_weight,
       |               CAST(floor(sqrt(sum(n_tok))) AS BIGINT) AS sq
       |        FROM toks GROUP BY source),
       |tot AS (SELECT sum(dom_weight)::BIGINT AS all_weight, sum(sq)::BIGINT AS sq_sum
       |        FROM dom),
       |rated AS (
       |  SELECT d.source, d.n_total, d.dom_weight, d.sq,
       |         least(10000, (10000 * (((t.all_weight // $MixDenom) * d.sq) // t.sq_sum)) // d.dom_weight)::BIGINT AS rate_bp
       |  FROM dom d CROSS JOIN tot t),
       |kept AS (
       |  SELECT tk.source, tk.doc_id, tk.n_tok
       |  FROM toks tk JOIN rated r ON tk.source = r.source
       |  WHERE ('0x' || substr(md5('$MixSeed:' || CAST(tk.doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 < r.rate_bp)
       |SELECT r.source, r.n_total, r.dom_weight, r.sq, r.rate_bp,
       |       count(k.doc_id)::BIGINT AS n_kept,
       |       COALESCE(sum(k.n_tok), 0)::BIGINT AS tok_kept
       |FROM rated r LEFT JOIN kept k ON r.source = k.source
       |GROUP BY r.source, r.n_total, r.dom_weight, r.sq, r.rate_bp
       |ORDER BY r.source""".stripMargin

  // ---- q120: repetition rules ----------------------------------------

  private val repetitionSql =
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |m AS (
       |  SELECT doc_id, lang, len(t)::BIGINT AS n_tok,
       |         len(list_distinct(t))::BIGINT AS n_dist,
       |         [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS g2
       |  FROM toks),
       |r AS (SELECT doc_id, lang, n_tok, n_dist, len(g2)::BIGINT AS n2,
       |             COALESCE(list_max([len(list_filter(g2, y -> y = x)) for x in list_distinct(g2)]), 0)::BIGINT AS max2
       |      FROM m)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN (n_tok - n_dist) * 100 >= n_tok * $DupTokenPct THEN 1 ELSE 0 END)::BIGINT AS n_flag_dup_tokens,
       |       sum(CASE WHEN n2 > 0 AND max2 * 100 >= n2 * $TopGram2Pct THEN 1 ELSE 0 END)::BIGINT AS n_flag_top_2gram,
       |       sum(max2)::BIGINT AS sum_max_2gram,
       |       sum(n_dist)::BIGINT AS sum_distinct_tokens
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q129: exact substring dedup -----------------------------------

  /** Span width for the fixture (the paper's production setting is 50
    * tokens; 10 keeps the near-dup partners' shared spans detectable
    * on ~54-token docs). */
  private val SpanK = 10

  private val substringDedupSql = {
    val k = SpanK
    val base = SubstringDedup.PosBase
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |occ AS (SELECT doc_id, i.i AS pos, array_to_string(t[i.i:i.i+${k - 1}], ' ') AS g
       |        FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t)-${k - 2})) AS i) i
       |        WHERE len(t) >= $k),
       |dupg AS (SELECT g, min(doc_id*$base+pos) AS canon FROM occ
       |         GROUP BY g HAVING count(*) > 1),
       |rem AS (SELECT o.doc_id, o.pos FROM occ o JOIN dupg d ON o.g = d.g
       |        WHERE o.doc_id*$base+o.pos <> d.canon),
       |cov AS (SELECT DISTINCT doc_id, p.p FROM rem
       |        CROSS JOIN LATERAL (SELECT unnest(range(pos, pos+$k)) AS p) p),
       |tokpos AS (SELECT doc_id, i.i AS p, t[i.i] AS tok FROM toks
       |           CROSS JOIN LATERAL (SELECT unnest(range(1, len(t)+1)) AS i) i),
       |keptdoc AS (
       |  SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.p) AS kept_text,
       |         count(*)::BIGINT AS n_kept
       |  FROM tokpos tp LEFT JOIN cov c ON tp.doc_id = c.doc_id AND tp.p = c.p
       |  WHERE c.p IS NULL GROUP BY tp.doc_id),
       |affected AS (SELECT DISTINCT doc_id FROM rem)
       |SELECT a.doc_id, COALESCE(k.kept_text, '') AS kept_text,
       |       COALESCE(k.n_kept, 0)::BIGINT AS n_kept
       |FROM affected a LEFT JOIN keptdoc k ON a.doc_id = k.doc_id
       |ORDER BY a.doc_id""".stripMargin
  }

  // ---- q203: intra-doc paragraph dedup --------------------------------

  /** Keep-first exact paragraph dedup WITHIN each document — the
    * RefinedWeb/MassiveText cleanup step that removes repeated
    * boilerplate paragraphs (nav bars, footers, quoted reposts) a
    * cross-doc dedup never sees. Fixture paragraphs are synthesized
    * from the marker-word split (the q197 convention) and duplicates
    * are planted deterministically (doc_id%3 re-appends the first
    * paragraph, else doc_id%4 the last) so the keep-first rule has
    * real work on every third doc. */
  private val intraDocDedupSql =
    """WITH aug AS (
      |  SELECT doc_id,
      |         string_split(replace(text, ' merge ', chr(10)), chr(10)) AS p0
      |  FROM documents),
      |ps AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN list_append(p0, p0[1])
      |              WHEN doc_id % 4 = 0 THEN list_append(p0, p0[len(p0)])
      |              ELSE p0 END AS p
      |  FROM aug),
      |d AS (
      |  SELECT doc_id, p,
      |         list_filter(p, (x, i) -> list_position(p, x) = i) AS k
      |  FROM ps)
      |SELECT doc_id, len(p)::BIGINT AS n_paras, len(k)::BIGINT AS n_kept,
      |       md5(array_to_string(k, chr(10))) AS kept_md5
      |FROM d ORDER BY doc_id""".stripMargin

  // ---- q204: URL curation ---------------------------------------------

  /** Registered domains the fixture blocklist rejects. */
  private[queries] val BlockedDomains =
    Seq("src3.com", "src7.net", "src11.org", "src15.com")

  /** Deterministic fixture URL for a document (the fixture has no URL
    * column): mixed-case subdomain, per-source host, rotating TLD,
    * path collapsed mod 100 so normalization produces REAL collisions,
    * `utm_*` tracking params on even ids, a kept `id` param, and a
    * fragment every 7th doc — every normalization branch exercised. */
  private def urlSqlExpr: String =
    """'https://' ||
      |CASE doc_id % 5 WHEN 0 THEN 'WWW.' WHEN 1 THEN 'cdn.' ELSE '' END ||
      |source || '.' ||
      |CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END ||
      |'/p/' || CAST(doc_id % 100 AS STRING) ||
      |CASE WHEN doc_id % 2 = 0
      |     THEN '?utm_source=u' || CAST(doc_id AS STRING) ||
      |          '&id=' || CAST(doc_id % 10 AS STRING)
      |     WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 10 AS STRING)
      |     ELSE '' END ||
      |CASE WHEN doc_id % 7 = 0 THEN '#s2' ELSE '' END""".stripMargin

  /** The url → (host, normalized) decomposition CTE chain — ONE
    * statement shared by the q204 oracle and the q219 leakage oracle
    * so the normalization rule cannot fork. Yields `n(doc_id, host,
    * norm)`. */
  private val urlNormCte =
    s"""WITH u AS (SELECT doc_id, ${urlSqlExpr.replace("\n", " ")} AS url FROM documents),
       |p AS (
       |  SELECT doc_id, url,
       |         lower(split_part(substr(url, 9), '/', 1)) AS host,
       |         substr(substr(url, 9),
       |                len(split_part(substr(url, 9), '/', 1)) + 1) AS pqf
       |  FROM u),
       |q AS (
       |  SELECT doc_id, host,
       |         split_part(split_part(pqf, '?', 1), '#', 1) AS path,
       |         CASE WHEN contains(pqf, '?')
       |              THEN split_part(split_part(pqf, '?', 2), '#', 1)
       |              ELSE '' END AS qs
       |  FROM p),
       |n AS (
       |  SELECT doc_id, host,
       |         'https://' || host || path ||
       |         CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS norm
       |  FROM (SELECT *, array_to_string(list_filter(string_split(qs, '&'),
       |          x -> NOT starts_with(x, 'utm_') AND x <> ''), '&') AS kept
       |        FROM q))""".stripMargin

  private val urlCurationSql =
    s"""$urlNormCte,
       |r AS (
       |  SELECT doc_id, norm,
       |         array_to_string(labels[len(labels)-1:], '.') AS reg
       |  FROM (SELECT *, string_split(host, '.') AS labels FROM n)),
       |b AS (SELECT doc_id, norm, reg,
       |             reg IN (${BlockedDomains.map("'" + _ + "'").mkString(",")})
       |               AS blocked
       |      FROM r)
       |SELECT reg, count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN blocked THEN 1 ELSE 0 END)::BIGINT AS n_blocked,
       |       count(DISTINCT CASE WHEN NOT blocked THEN norm END)::BIGINT
       |         AS n_norm_urls
       |FROM b GROUP BY reg ORDER BY reg""".stripMargin

  /** q219: split leakage through URL ALIASING — two crawls of the
    * same page (utm variants) landing in different folds leak
    * train→test even when the q141 text-level audit is clean. Oracle:
    * the SAME normalization chain as q204 + the SAME md5 fold rule as
    * q100. */
  private val urlLeakageSql =
    s"""$urlNormCte,
       |f AS (
       |  SELECT doc_id, norm,
       |         CASE WHEN bp < 8000 THEN 'train'
       |              WHEN bp < 9000 THEN 'val'
       |              ELSE 'test' END AS fold
       |  FROM (SELECT doc_id, norm,
       |               ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000 AS bp
       |        FROM n)),
       |g AS (SELECT norm FROM f GROUP BY norm HAVING count(DISTINCT fold) >= 2)
       |SELECT fold, count(DISTINCT f.norm)::BIGINT AS n_leaky_urls,
       |       count(*)::BIGINT AS n_leaky_docs,
       |       sum(doc_id)::BIGINT AS id_sum
       |FROM f JOIN g ON f.norm = g.norm
       |GROUP BY fold ORDER BY fold""".stripMargin

  // ---- declared queries ----------------------------------------------

  /** q140's recipe: 0.3 epochs of English, 2.5 of Chinese, 1.0
    * elsewhere. */
  private val EpochRecipe = Map("en" -> 3000, "zh" -> 25000)
  private val EpochSeed = "ep"

  private val epochMixSql =
    """WITH e AS (
      |  SELECT doc_id, lang,
      |         CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 25000
      |              ELSE 10000 END AS ebp,
      |         ('0x' || substr(md5('ep:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
      |           % 10000 AS bp
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang,
      |         ebp // 10000 + CASE WHEN bp < ebp % 10000 THEN 1 ELSE 0 END AS copies
      |  FROM e)
      |SELECT lang, sum(copies)::BIGINT AS n_emitted,
      |       count(CASE WHEN copies > 0 THEN 1 END)::BIGINT AS n_docs,
      |       sum(doc_id * copies)::BIGINT AS id_sum,
      |       max(copies)::INT AS max_epoch
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q116_decontaminate", decontaminateSql) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val train = docs.where(col("doc_id") % EvalMod =!= 0)
      val contam = contamIds(spark, dir).withColumn("is_contam", lit(1))
      train.select(col("doc_id"), col("lang"))
        .join(broadcast(contam), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_train"),
          sum(when(col("is_contam").isNotNull, 1L).otherwise(0L))
            .as("n_contaminated"),
          sum(when(col("is_contam").isNull, col("doc_id")).otherwise(0L))
            .as("kept_id_sum"))
        .orderBy(col("lang"))
    },

    QueryDef("q117_pii_scrub", piiSql) { (spark, dir) =>
      val aug = Tables.loadParallel(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          augmented(col("text"), col("doc_id")).as("text"))
      aug.select(col("lang"),
        PiiScrub.emailCount(col("text")).as("n_email"),
        PiiScrub.phoneCount(col("text")).as("n_phone"),
        PiiScrub.ipv4Count(col("text")).as("n_ip"),
        length(PiiScrub.redact(col("text"))).cast("long").as("redacted_len"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_email"),
          sum(col("n_phone")).as("n_phone"),
          sum(col("n_ip")).as("n_ip"),
          sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L)
            .otherwise(0L)).as("n_docs_with_pii"),
          sum(col("redacted_len")).as("sum_redacted_len"))
        .orderBy(col("lang"))
    },

    QueryDef("q118_semantic_dedup", semanticDedupSql) { (spark, dir) =>
      GraftFunctions.register(spark)
      val assigned = SimilarityQueries.ivfIndex(spark, dir)
      val dropped = SemanticDedup.dropIds(assigned, semTau)
      assigned.select(col("vec_id"), col("cid"))
        .join(dropped, Seq("vec_id"), "left_semi")
        .orderBy(col("vec_id"))
    },

    QueryDef("q119_domain_mix", domainMixSql) { (spark, dir) =>
      val toks = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val rated = DomainMix.rates(toks, "source", col("n_tok"), MixDenom)
      val kept = DomainMix
        .sample(toks, "doc_id", "source", col("n_tok"), MixDenom, MixSeed)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tok_kept"),
          sum(col("doc_id")).as("kept_id_sum"))
      rated.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("dom_weight"), col("rate_bp"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tok_kept"), lit(0L)).as("tok_kept"),
          coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
        .orderBy(col("source"))
    },

    // WEIGHTED reservoir sampling (Efraimidis-Spirakis A-Res — the
    // very key construction the reference UDA uses at partial-output
    // time, `median.cc` A-Res weight keys, promoted to a user-facing
    // operator): item key = -ln(u)/w with u a deterministic md5
    // uniform, sample = top-k by SMALLEST key. Deterministic u makes
    // the sample reprocessing-stable AND oracle-replayable; the key
    // is quantized to nano-units with id tie-break so the cut is
    // integer-exact. Selection is one bounded top-k (partial heap
    // below the exchange), weights = token counts — long docs
    // proportionally likelier, the length-debiased sampling a corpus
    // audit wants.
    QueryDef("q192_weighted_sample",
      s"""WITH w AS (
         |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS wt FROM documents),
         |keyed AS (
         |  SELECT doc_id, wt,
         |         CAST(round(
         |           -ln((('0x' || substr(md5('ws7:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
         |               / 4503599627370497.0)
         |           / wt * 1000000000.0) AS BIGINT) AS key_nano
         |  FROM w WHERE wt > 0),
         |pick AS (
         |  SELECT doc_id, wt, key_nano FROM keyed
         |  ORDER BY key_nano, doc_id LIMIT 32)
         |SELECT doc_id, wt, key_nano FROM pick ORDER BY doc_id""".stripMargin) {
      (spark, dir) =>
        val u = (conv(substring(md5(concat(lit("ws7:"),
          col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long") + 1)
          .cast("double") / lit(4503599627370497.0)
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("wt"))
          .where(col("wt") > 0)
          .select(col("doc_id"), col("wt"),
            round(-log(u) / col("wt") * 1000000000.0).cast("long")
              .as("key_nano"))
          .orderBy(col("key_nano"), col("doc_id"))
          .limit(32)
          .orderBy(col("doc_id"))
    },

    // q119's equal-share mix with an α = 0.5 TEMPERATURE budget
    // (XLM-R-style multilingual sampling): hot domains damped, tail
    // boosted, relative order preserved. Same two-pass scale shape —
    // one partial-agg'd corpus groupBy, broadcast rates, map-only
    // keep/drop stable on (seed, id).
    QueryDef("q180_temperature_mix", temperatureMixSql) { (spark, dir) =>
      val toks = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val rated = DomainMix.temperatureRates(toks, "source", col("n_tok"),
        MixDenom)
      val kept = DomainMix
        .temperatureSample(toks, "doc_id", "source", col("n_tok"), MixDenom,
          MixSeed)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tok_kept"))
      rated.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("dom_weight"), col("sq"),
          col("rate_bp"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tok_kept"), lit(0L)).as("tok_kept"))
        .orderBy(col("source"))
    },

    QueryDef("q129_substring_dedup", substringDedupSql) { (spark, dir) =>
      val docs = Tables.loadParallel(spark, dir, "documents")
      // one materialization of the (small) removal-start set feeds
      // BOTH the affected-doc filter and the reassembly — without it
      // the occurrence explode + gram aggregation would run twice
      val rs = FrameMemo.checkpointed(
        SubstringDedup.removalStarts(docs, "doc_id", "text", SpanK))
      val affected = rs.select(col("doc_id")).distinct()
      SubstringDedup.scrubWithStarts(docs, rs, "doc_id", "text", SpanK)
        .join(affected, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("kept_text"), col("n_kept"))
        .orderBy(col("doc_id"))
    },

    // The 100 TB production mode of q129: grams ride the exchange as
    // 64-bit xxhash64 keys (8 bytes vs ~100 for k=10 token text). The
    // oracle replays the pipeline over EXACT grams — hashing is
    // result-invisible absent a 64-bit collision (~n²/2⁶⁴; zero on the
    // fixture, ~3e-5 expected false spans even at 10¹² grams), which
    // is precisely the claim this gate pins. SubstringDedupSpec
    // additionally measures the shuffle-byte cut.
    QueryDef("q164_substring_dedup_hashed", substringDedupSql) { (spark, dir) =>
      val docs = Tables.loadParallel(spark, dir, "documents")
      val rs = FrameMemo.checkpointed(SubstringDedup
        .removalStarts(docs, "doc_id", "text", SpanK, hashGrams = true))
      val affected = rs.select(col("doc_id")).distinct()
      SubstringDedup.scrubWithStarts(docs, rs, "doc_id", "text", SpanK)
        .join(affected, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("kept_text"), col("n_kept"))
        .orderBy(col("doc_id"))
    },

    QueryDef("q120_repetition_rules", repetitionSql) { (spark, dir) =>
      val toks = split(col("text"), " ")
      Tables.load(spark, dir, "documents")
        .select(col("lang"),
          when(RepetitionStats.dupTokenFlag(toks, DupTokenPct), 1L)
            .otherwise(0L).as("flag_dup"),
          when(size(RepetitionStats.grams2(toks)) > 0 &&
            RepetitionStats.topGram2Flag(toks, TopGram2Pct), 1L)
            .otherwise(0L).as("flag_top2"),
          RepetitionStats.maxGram2Count(toks).as("max2"),
          size(array_distinct(toks)).cast("long").as("n_dist"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("flag_dup")).as("n_flag_dup_tokens"),
          sum(col("flag_top2")).as("n_flag_top_2gram"),
          sum(col("max2")).as("sum_max_2gram"),
          sum(col("n_dist")).as("sum_distinct_tokens"))
        .orderBy(col("lang"))
    },

    // Fractional epochs-per-domain replication — the data-recipe pass
    // (0.3 epochs of the dominant crawl, 2.5 of a scarce source, 1.0
    // otherwise) that unifies up- and downsampling in one md5-bp
    // rule: copies = e div 10000 + (bucket < e mod 10000). The gate
    // pins emitted-row counts, surviving-doc counts, multiplicity-
    // weighted id sums, and the max copy index per language — one
    // document replicated or dropped differently anywhere fails.
    QueryDef("q140_epoch_mix", epochMixSql) { (spark, dir) =>
      graft.operators.EpochMix
        .replicate(Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("lang")),
          "doc_id", "lang", EpochRecipe, defaultBp = 10000, seed = EpochSeed)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_emitted"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          max(col("epoch")).as("max_epoch"))
        .orderBy(col("lang"))
    },

    // Feature-HASHED linear quality classifier — the learned-model
    // scoring stage (fastText-style) beside the heuristic (q43) and
    // adaptive (q143) filters. The hashing trick is modeled honestly:
    // a token's weight is pure per-row arithmetic on its hash
    // (md5-bp, the DataSplit convention, centered to [-5000, 4999]),
    // so the "model" ships as CODE — no vocab-sized weight table, no
    // lookup join, no shuffle anywhere before the per-lang audit agg.
    // A trained quantized model swaps the hash for a broadcast map
    // keyed the same way; the plan does not change. Integer weights
    // summed per document over the token array are order-free EXACT
    // arithmetic — both engines agree to the last bit, and the gate
    // hash-compares the score extremes and the kept set.
    QueryDef("q151_hashed_classifier",
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |         list_aggregate(list_transform(l,
        |           t -> ('0x' || substr(md5('w:' || t), 1, 7))::BIGINT % 10000 - 5000),
        |           'sum')::BIGINT AS score
        |  FROM d)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       count(*) FILTER (WHERE score >= 0)::BIGINT AS n_kept,
        |       coalesce(sum(doc_id) FILTER (WHERE score >= 0), 0)::BIGINT AS id_sum_kept,
        |       min(score)::BIGINT AS min_score,
        |       max(score)::BIGINT AS max_score
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      val weight = (t: Column) =>
        conv(substring(md5(concat(lit("w:"), t)), 1, 7), 16, 10)
          .cast("long") % 10000 - 5000
      val kept = col("score") >= 0
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          aggregate(transform(split(col("text"), " "), weight),
            lit(0L), (a, x) => a + x).as("score"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(kept, 1)).as("n_kept"),
          coalesce(sum(when(kept, col("doc_id"))), lit(0L)).as("id_sum_kept"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("lang"))
    },

    // PRECISION/RECALL CURVE for the q151 classifier — the threshold
    // CALIBRATION pass run before wiring any learned filter into a
    // pipeline: sweep the decision threshold, emit the confusion
    // census and integer-bp precision/recall per point, against a
    // deterministic reference label (length >= 300 chars — the
    // "substantive document" proxy; a labeled eval set drops in the
    // same way). One corpus scan computes every threshold's cells via
    // conditional aggregation (the q217 sweep discipline);
    // greatest(1, ·) guards the empty-cell divisions in both engines.
    QueryDef("q261_pr_curve",
      """WITH s AS (
        |  SELECT doc_id, n_chars >= 300 AS pos,
        |         list_aggregate(list_transform(string_split(text, ' '),
        |           t -> ('0x' || substr(md5('w:' || t), 1, 7))::BIGINT % 10000 - 5000),
        |           'sum')::BIGINT AS score
        |  FROM documents),
        |t AS (SELECT unnest([-2000, -1000, 0, 1000, 2000]) AS th),
        |c AS (
        |  SELECT th,
        |         sum(CASE WHEN score >= th AND pos THEN 1 ELSE 0 END)::BIGINT AS tp,
        |         sum(CASE WHEN score >= th AND NOT pos THEN 1 ELSE 0 END)::BIGINT AS fp,
        |         sum(CASE WHEN score < th AND pos THEN 1 ELSE 0 END)::BIGINT AS fn,
        |         sum(CASE WHEN score < th AND NOT pos THEN 1 ELSE 0 END)::BIGINT AS tn
        |  FROM s CROSS JOIN t GROUP BY th)
        |SELECT th::BIGINT AS threshold, tp, fp, fn, tn,
        |       ((10000 * tp) // greatest(1, tp + fp))::BIGINT AS precision_bp,
        |       ((10000 * tp) // greatest(1, tp + fn))::BIGINT AS recall_bp
        |FROM c ORDER BY threshold""".stripMargin) { (spark, dir) =>
      val weight = (t: Column) =>
        conv(substring(md5(concat(lit("w:"), t)), 1, 7), 16, 10)
          .cast("long") % 10000 - 5000
      val s = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), (col("n_chars") >= 300).as("pos"),
          aggregate(transform(split(col("text"), " "), weight),
            lit(0L), (a, x) => a + x).as("score"))
      val t = broadcast(spark.range(0, 5)
        .select((lit(-2000L) + col("id") * 1000).as("th")))
      s.crossJoin(t)
        .groupBy(col("th"))
        .agg(
          sum(when(col("score") >= col("th") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("th") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(col("score") < col("th") && col("pos"), 1L).otherwise(0L)).as("fn"),
          sum(when(col("score") < col("th") && !col("pos"), 1L).otherwise(0L)).as("tn"))
        .select(col("th").as("threshold"), col("tp"), col("fp"), col("fn"),
          col("tn"),
          expr("(10000L * tp) DIV greatest(1L, tp + fp)").as("precision_bp"),
          expr("(10000L * tp) DIV greatest(1L, tp + fn)").as("recall_bp"))
        .orderBy(col("threshold"))
    },

    // BRIER-SCORE CALIBRATION audit of the q261 classifier: scores map
    // to a predicted probability in basis points (clamped affine — no
    // negative-operand DIV, so Spark's truncating DIV and DuckDB's //
    // agree), docs bucket into 10 probability bins, and each bin
    // reports predicted-vs-observed rate plus its conditional Brier
    // term; the bin=-1 summary row (sorted first, the ADVICE r10
    // union-order convention) carries the corpus Brier score. All
    // integer: (p−y)² in bp² is exact, so reliability gaps are
    // hash-stable. Scale shape: one map-only scoring pass into a
    // 10-cell groupBy — the same mergeable-partials form every sketch
    // gate ships.
    QueryDef("q279_brier_calibration",
      """WITH s AS (
        |  SELECT doc_id, n_chars >= 300 AS pos,
        |         list_aggregate(list_transform(string_split(text, ' '),
        |           t -> ('0x' || substr(md5('w:' || t), 1, 7))::BIGINT % 10000 - 5000),
        |           'sum')::BIGINT AS score
        |  FROM documents),
        |p AS (SELECT pos,
        |             greatest(0, least(159999, score + 80000)) // 16 AS p_bp FROM s),
        |b AS (SELECT p_bp // 1000 AS bin, pos, p_bp,
        |             p_bp - CASE WHEN pos THEN 10000 ELSE 0 END AS err FROM p),
        |g AS (SELECT bin, count(*)::BIGINT AS n,
        |             sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |             sum(p_bp)::BIGINT AS sp, sum(err*err)::BIGINT AS sq
        |      FROM b GROUP BY bin),
        |tot AS (SELECT CAST(-1 AS BIGINT) AS bin, sum(n)::BIGINT AS n,
        |               sum(n_pos)::BIGINT AS n_pos, sum(sp)::BIGINT AS sp,
        |               sum(sq)::BIGINT AS sq FROM g)
        |SELECT bin, n, n_pos, (sp // n)::BIGINT AS p_mean_bp,
        |       ((10000*n_pos) // n)::BIGINT AS obs_bp,
        |       (sp // n - (10000*n_pos) // n)::BIGINT AS gap_bp,
        |       (sq // n)::BIGINT AS brier_e4
        |FROM (SELECT * FROM g UNION ALL SELECT * FROM tot) u
        |ORDER BY bin""".stripMargin) { (spark, dir) =>
      val weight = (t: Column) =>
        conv(substring(md5(concat(lit("w:"), t)), 1, 7), 16, 10)
          .cast("long") % 10000 - 5000
      val s = Tables.load(spark, dir, "documents")
        .select((col("n_chars") >= 300).as("pos"),
          aggregate(transform(split(col("text"), " "), weight),
            lit(0L), (a, x) => a + x).as("score"))
      val b = s
        .select(col("pos"),
          expr("greatest(0L, least(159999L, score + 80000L)) DIV 16").as("p_bp"))
        .select(expr("p_bp DIV 1000").as("bin"), col("pos"), col("p_bp"),
          expr("p_bp - IF(pos, 10000L, 0L)").as("err"))
      val g = b.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(col("p_bp")).as("sp"), sum(col("err") * col("err")).as("sq"))
      val tot = g.agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
          sum(col("sp")).as("sp"), sum(col("sq")).as("sq"))
        .select(lit(-1L).as("bin"), col("n"), col("n_pos"), col("sp"), col("sq"))
      g.unionByName(tot)
        .select(col("bin"), col("n"), col("n_pos"),
          expr("sp DIV n").as("p_mean_bp"),
          expr("(10000L * n_pos) DIV n").as("obs_bp"),
          expr("sp DIV n - (10000L * n_pos) DIV n").as("gap_bp"),
          expr("sq DIV n").as("brier_e4"))
        .orderBy(col("bin"))
    },

    // COHEN'S KAPPA inter-rater agreement between the hashed-score
    // classifier (score ≥ 0) and the length rule (n_chars ≥ 300) —
    // the chance-corrected agreement statistic the PR/Brier/isotonic
    // family still lacked. One map-only pass to the 2×2 confusion
    // matrix, then κ in exact micro-units: po, pe and the final
    // ratio all use nonneg-operand DIV (pe < 1e6 structurally, so
    // the denominator is positive). Single-row output, every column
    // BIGINT.
    QueryDef("q291_cohens_kappa",
      """WITH s AS (
        |  SELECT n_chars >= 300 AS b,
        |         list_aggregate(list_transform(string_split(text, ' '),
        |           t -> ('0x' || substr(md5('w:' || t), 1, 7))::BIGINT % 10000 - 5000),
        |           'sum')::BIGINT >= 0 AS a
        |  FROM documents),
        |m AS (SELECT count(*)::BIGINT AS n,
        |             sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
        |             sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
        |             sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
        |             sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n00
        |      FROM s),
        |k AS (SELECT n, n11, n10, n01, n00,
        |             (1000000 * (n11 + n00)) // n AS po,
        |             (1000000 * ((n11 + n10) * (n11 + n01)
        |                         + (n01 + n00) * (n10 + n00))) // (n * n) AS pe
        |      FROM m)
        |SELECT n, n11, n10, n01, n00, po AS po_micro, pe AS pe_micro,
        |       ((1000000 * (po - pe)) // (1000000 - pe))::BIGINT AS kappa_micro
        |FROM k""".stripMargin) { (spark, dir) =>
      val weight = (t: Column) =>
        conv(substring(md5(concat(lit("w:"), t)), 1, 7), 16, 10)
          .cast("long") % 10000 - 5000
      val s = Tables.load(spark, dir, "documents")
        .select((col("n_chars") >= 300).as("b"),
          (aggregate(transform(split(col("text"), " "), weight),
            lit(0L), (a, x) => a + x) >= 0).as("a"))
      s.agg(count(lit(1)).as("n"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
          sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          expr("(1000000L * (n11 + n00)) DIV n").as("po"),
          expr("""(1000000L * ((n11 + n10) * (n11 + n01)
                 | + (n01 + n00) * (n10 + n00))) DIV (n * n)""".stripMargin)
            .as("pe"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          col("po").as("po_micro"), col("pe").as("pe_micro"),
          expr("(1000000L * (po - pe)) DIV (1000000L - pe)").as("kappa_micro"))
    },

    // ISOTONIC CALIBRATION (pool-adjacent-violators) of the q279
    // reliability curve, via the PAVA minimax identity iso(i) =
    // max_{j≤i} min_{k≥i} mean(obs[j..k]) — which turns the
    // inherently-sequential pooling algorithm into three θ-joins over
    // the BOUNDED BIN GRAIN (10 rows → ≤55 segments, whatever the
    // corpus size; the corpus is touched exactly once, in the bin
    // aggregation). Segment means are exact-integer micro-rates with
    // nonneg-operand DIV, so the fitted curve hashes identically in
    // both engines, and monotonicity is structural (the minimax is
    // non-decreasing in i). CalibrationSpec pins monotone + PAVA
    // pool-equality against a sequential replay.
    QueryDef("q283_isotonic_calibration",
      """WITH s AS (
        |  SELECT doc_id, n_chars >= 300 AS pos,
        |         list_aggregate(list_transform(string_split(text, ' '),
        |           t -> ('0x' || substr(md5('w:' || t), 1, 7))::BIGINT % 10000 - 5000),
        |           'sum')::BIGINT AS score
        |  FROM documents),
        |p AS (SELECT pos,
        |             greatest(0, least(159999, score + 80000)) // 16 AS p_bp FROM s),
        |g AS (SELECT p_bp // 1000 AS bin, count(*)::BIGINT AS n,
        |             sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos
        |      FROM p GROUP BY 1),
        |seg AS (SELECT j.bin AS j, k.bin AS k,
        |               ((1000000 * sum(x.n_pos)) // sum(x.n))::BIGINT AS m
        |        FROM g j JOIN g k ON j.bin <= k.bin
        |        JOIN g x ON x.bin BETWEEN j.bin AND k.bin
        |        GROUP BY j.bin, k.bin),
        |mins AS (SELECT i.bin AS bin, s2.j AS j, min(s2.m) AS mn
        |         FROM g i JOIN seg s2 ON s2.j <= i.bin AND i.bin <= s2.k
        |         GROUP BY i.bin, s2.j),
        |iso AS (SELECT bin, CAST(max(mn) AS BIGINT) AS iso_micro
        |        FROM mins GROUP BY bin)
        |SELECT g.bin, g.n, ((10000 * g.n_pos) // g.n)::BIGINT AS obs_bp,
        |       iso.iso_micro
        |FROM g JOIN iso ON iso.bin = g.bin ORDER BY g.bin""".stripMargin) {
      (spark, dir) =>
        val weight = (t: Column) =>
          conv(substring(md5(concat(lit("w:"), t)), 1, 7), 16, 10)
            .cast("long") % 10000 - 5000
        val g = FrameMemo.checkpointed(Tables.load(spark, dir, "documents")
          .select((col("n_chars") >= 300).as("pos"),
            aggregate(transform(split(col("text"), " "), weight),
              lit(0L), (a, x) => a + x).as("score"))
          .select(col("pos"),
            expr("greatest(0L, least(159999L, score + 80000L)) DIV 16").as("p_bp"))
          .groupBy(expr("p_bp DIV 1000").as("bin"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos")))
        val jj = g.select(col("bin").as("j"))
        val kk = g.select(col("bin").as("k"))
        val xx = g.select(col("bin").as("xb"), col("n_pos").as("xp"),
          col("n").as("xn"))
        val seg = jj.join(kk, col("j") <= col("k"))
          .join(xx, col("xb").between(col("j"), col("k")))
          .groupBy(col("j"), col("k"))
          .agg(expr("(1000000L * sum(xp)) DIV sum(xn)").as("m"))
        val mins = g.select(col("bin").as("i"))
          .join(seg, col("j") <= col("i") && col("i") <= col("k"))
          .groupBy(col("i"), col("j")).agg(min(col("m")).as("mn"))
        val iso = mins.groupBy(col("i")).agg(max(col("mn")).as("iso_micro"))
        g.join(iso, g("bin") === iso("i"))
          .select(col("bin"), col("n"),
            expr("(10000L * n_pos) DIV n").as("obs_bp"), col("iso_micro"))
          .orderBy(col("bin"))
    },

    // Exact-QUOTA stratified sampling: exactly k rows per stratum (the
    // eval-set / few-shot-pool builder), chosen by md5-hash rank so
    // the pick is reprocessing-stable and needs NO per-stratum counts
    // up front — unlike rate-based q102, which hits a quota only in
    // expectation. One exchange on the stratum key; the per-stratum
    // top-k is a partial WindowGroupLimit below it, so a hot stratum
    // never materializes beyond k rows per map task.
    QueryDef("q155_quota_sample",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS hk
        |  FROM documents)
        |SELECT lang, rn AS pos, doc_id FROM (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS BIGINT) AS rn
        |  FROM r) t
        |WHERE rn <= 20 ORDER BY lang, pos""".stripMargin) { (spark, dir) =>
      val hk = conv(substring(md5(concat(lit("q:"), col("doc_id").cast("string"))),
        1, 7), 16, 10).cast("long")
      val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), hk.as("hk"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 20)
        .select(col("lang"), col("rn").as("pos"), col("doc_id"))
        .orderBy(col("lang"), col("pos"))
    },

    // Deterministic per-EPOCH training-order shuffle: each epoch orders
    // the corpus by md5("sh:epoch:id") — a different, reproducible
    // permutation per epoch with zero state (resuming a crashed epoch
    // re-derives the identical order). At 100 TB the full ordering is
    // ONE range exchange per epoch (ORDER BY the hash — how training
    // shards are actually laid out); the gate pins the first 20
    // positions of two epochs, enough to hash-check both permutations
    // and their decorrelation.
    QueryDef("q156_epoch_shuffle",
      """WITH h AS (
        |  SELECT epoch, doc_id,
        |         ('0x' || substr(md5('sh:' || CAST(epoch AS VARCHAR) || ':'
        |            || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS hk
        |  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch))
        |SELECT epoch::BIGINT AS epoch, rn AS pos, doc_id FROM (
        |  SELECT epoch, doc_id,
        |         CAST(row_number() OVER (PARTITION BY epoch ORDER BY hk, doc_id) AS BIGINT) AS rn
        |  FROM h) t
        |WHERE rn <= 20 ORDER BY epoch, pos""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val hk = conv(substring(md5(concat(lit("sh:"), col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val w = Window.partitionBy(col("epoch")).orderBy(col("hk"), col("doc_id"))
      Tables.load(spark, dir, "documents").select(col("doc_id"))
        .crossJoin(broadcast(Seq(0L, 1L).toDF("epoch")))
        .select(col("epoch"), col("doc_id"), hk.as("hk"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 20)
        .select(col("epoch"), col("rn").as("pos"), col("doc_id"))
        .orderBy(col("epoch"), col("pos"))
    },

    // DSIR importance resampling (Xie et al. 2023): select raw docs
    // whose hashed-unigram distribution matches a TARGET corpus
    // (here: the English slice), via log p_target − log p_raw under
    // add-one-smoothed bag-of-hashed-ngram models and deterministic
    // Gumbel-top-k sampling without replacement. Everything integer
    // after ONE micro-nat quantization per bucket (explicit half-up
    // floor(x·1e6 + 0.5) — signed weights, so engine round() tie
    // rules would diverge), so doc scores are exact BIGINT sums and
    // the oracle replays bit-for-bit. Scale: two corpus scans end in
    // a 1024-row bucket table; scoring is a BROADCAST join + map-side
    // partial agg (one exchanged row per doc); selection is bounded
    // top-k. See [[graft.operators.Dsir]].
    QueryDef("q196_dsir_select",
      s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
         |rb AS (
         |  SELECT doc_id, lang,
         |         ('0x' || substr(md5('dsir:' || u.w), 1, 7))::BIGINT % $DsirBuckets AS bucket
         |  FROM toks CROSS JOIN LATERAL (SELECT unnest(t) AS w) u),
         |rcnt AS (SELECT bucket, count(*)::BIGINT AS cnt FROM rb GROUP BY bucket),
         |tcnt AS (SELECT bucket, count(*)::BIGINT AS cnt_t FROM rb
         |         WHERE lang = '$DsirTargetLang' GROUP BY bucket),
         |tot AS (SELECT (SELECT sum(cnt) FROM rcnt)::BIGINT AS tot_r,
         |               (SELECT COALESCE(sum(cnt_t), 0) FROM tcnt)::BIGINT AS tot_t),
         |wt AS (
         |  SELECT r.bucket,
         |         CAST(floor(ln(
         |             ((COALESCE(t.cnt_t, 0) + 1) * (tot.tot_r + $DsirBuckets))::DOUBLE
         |           / ((r.cnt + 1) * (tot.tot_t + $DsirBuckets)))
         |           * ${graft.operators.Dsir.Scale} + 0.5) AS BIGINT) AS w_micro
         |  FROM rcnt r LEFT JOIN tcnt t ON r.bucket = t.bucket CROSS JOIN tot),
         |sc AS (
         |  SELECT b.doc_id, b.lang, COALESCE(sum(wt.w_micro), 0)::BIGINT AS score_micro
         |  FROM rb b LEFT JOIN wt ON b.bucket = wt.bucket
         |  GROUP BY b.doc_id, b.lang),
         |sel AS (
         |  SELECT doc_id, lang, score_micro,
         |         score_micro + CAST(floor(-ln(-ln(
         |             (('0x' || substr(md5('$DsirSeed:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT + 1)::DOUBLE
         |               / 268435457.0))
         |           * ${graft.operators.Dsir.Scale} + 0.5) AS BIGINT) AS key_micro
         |  FROM sc)
         |SELECT doc_id, lang, score_micro, key_micro
         |FROM sel ORDER BY key_micro DESC, doc_id LIMIT $DsirK""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      val weights = graft.operators.Dsir.bucketWeights(
        docs, docs.where(col("lang") === DsirTargetLang), "t", DsirBuckets)
      val scored = graft.operators.Dsir
        .score(docs, "doc_id", "t", weights, keep = Seq("lang"))
      graft.operators.Dsir.select(scored, "doc_id", DsirK, DsirSeed)
        .orderBy(col("key_micro").desc, col("doc_id"))
    },

    // C4-style line-level cleaning (Raffel et al. 2020 §2.2): doc
    // drops on code/boilerplate markers, line retention on terminal
    // punctuation + word count + javascript warnings, min-sentence
    // doc drop — the whole per-doc rewrite is ONE map-only
    // higher-order projection (split → filter → array_join, no
    // explode/re-group exchange). See [[graft.operators.C4Rules]].
    QueryDef("q197_c4_rules", c4Sql) { (spark, dir) =>
      val aug = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), concat(
          expr("replace(text, ' merge ', concat('.', chr(10)))"),
          when(col("doc_id") % 7 === 0, lit("\nlorem ipsum dolor sit amet."))
            .when(col("doc_id") % 7 === 1,
              lit("\nyou must enable javascript to view this page."))
            .when(col("doc_id") % 7 === 2, lit("\nif (config) { render(); }"))
            .when(col("doc_id") % 7 === 3, lit("\nread more"))
            .otherwise(lit(""))).as("t"))
      val st = aug.select(col("doc_id"), col("lang"),
          C4Rules.docBad(col("t")).as("bad"),
          C4Rules.keptLines(col("t"), C4Rules.MinWords).as("kl"))
        .select(col("doc_id"), col("lang"), col("bad"),
          size(col("kl")).cast("long").as("n_lines"),
          (!col("bad") && size(col("kl")) >= C4Rules.MinLines).as("kept"),
          when(!col("bad") && size(col("kl")) >= C4Rules.MinLines,
            length(C4Rules.cleaned(col("kl"))).cast("long"))
            .otherwise(0L).as("n_chars"))
      st.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("bad"), 1L).otherwise(0L)).as("n_doc_drops"),
          sum(when(!col("bad") && !col("kept"), 1L).otherwise(0L))
            .as("n_starved"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_lines")).otherwise(0L))
            .as("lines_kept"),
          sum(col("n_chars")).as("chars_kept"),
          sum(when(col("kept"), col("doc_id")).otherwise(0L))
            .as("kept_id_sum"))
        .orderBy(col("lang"))
    },

    // Bloom-broadcast decontamination — q116's SCALE PATH when even
    // the eval-set's distinct n-gram STRINGS are too wide to ship
    // whole: the grams collapse to a 64 Kbit bloom filter (one
    // broadcast row), the training corpus is probed per-row with a
    // short-circuiting higher-order `exists` (map-only, zero
    // exchange), and only the surviving CANDIDATES pay the exact
    // gram semi-join that removes bloom false positives. The oracle
    // is the PLAIN exact rule: no false negatives by construction,
    // false positives killed by the verify — the prefilter must be
    // invisible (the q69 bloom-semi-join argument).
    QueryDef("q199_bloom_decontaminate", bloomDecontSql) { (spark, dir) =>
      GraftFunctions.register(spark)
      val docs = Tables.loadParallel(spark, dir, "documents")
      Decontaminate.bloomContaminatedIds(
          docs.where(col("doc_id") % EvalMod =!= 0),
          docs.where(col("doc_id") % EvalMod === 0),
          "doc_id", "text", NGram, BloomBits, BloomHashes,
          keep = Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_contaminated"),
          sum(col("doc_id")).as("contam_id_sum"))
        .orderBy(col("lang"))
    },

    // Intra-document paragraph dedup (keep-first) — ONE map-only
    // higher-order projection: split → (planted dup) → filter by
    // first-occurrence position → checksum. Zero exchanges; per-doc
    // paragraph counts are small so the O(paras²) first-occurrence
    // scan is bounded per row. Spark HOF index is 0-based where
    // DuckDB's is 1-based — hence the `i + 1`.
    QueryDef("q203_intradoc_dedup", intraDocDedupSql) { (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          expr("split(replace(text, ' merge ', chr(10)), chr(10))").as("p0"))
        .withColumn("p", expr(
          """CASE WHEN doc_id % 3 = 0 THEN array_append(p0, p0[0])
            |     WHEN doc_id % 4 = 0 THEN array_append(p0, element_at(p0, -1))
            |     ELSE p0 END""".stripMargin))
        .withColumn("k",
          expr("filter(p, (x, i) -> array_position(p, x) = i + 1)"))
        .select(col("doc_id"),
          size(col("p")).cast("long").as("n_paras"),
          size(col("k")).cast("long").as("n_kept"),
          md5(array_join(col("k"), "\n")).as("kept_md5"))
        .orderBy(col("doc_id"))
    },

    // URL curation: host extraction via the `parse_url` built-in,
    // last-two-label registered domain, tracking-param-stripping
    // normalization (URL-level dedup collapses utm_* variants), and a
    // registered-domain blocklist — all map-only per-row string work;
    // the only exchanges are the per-domain aggregation (with a
    // partial distinct below it) and the presentation sort. See
    // [[graft.operators.UrlOps]].
    QueryDef("q204_url_curation", urlCurationSql) { (spark, dir) =>
      import graft.operators.UrlOps
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), expr(urlSqlExpr).as("url"))
        .withColumn("reg", UrlOps.registeredDomain(UrlOps.host(col("url"))))
        .withColumn("norm", UrlOps.normalized(col("url")))
        .withColumn("blocked", col("reg").isin(BlockedDomains: _*))
        .groupBy(col("reg"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
          countDistinct(when(!col("blocked"), col("norm"))).as("n_norm_urls"))
        .orderBy(col("reg"))
    },

    // URL-aliased split leakage: normalized URLs spanning ≥2 folds —
    // the audit q141's text-level check misses when two crawls of the
    // same page differ only in tracking params. One exchange on the
    // normalized URL (the group key) + one on fold; composes q204's
    // normalization with q100's fold rule unchanged.
    QueryDef("q219_url_leakage", urlLeakageSql) { (spark, dir) =>
      import graft.operators.{DataSplit, UrlOps}
      val folded = DataSplit.withFold(
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"), expr(urlSqlExpr).as("url"))
          .withColumn("norm", UrlOps.normalized(col("url"))),
        "doc_id", "42")
      val leaky = folded.groupBy(col("norm"))
        .agg(countDistinct(col("fold")).as("nf"))
        .where(col("nf") >= 2).select(col("norm"))
      folded.join(leaky, Seq("norm"))
        .groupBy(col("fold"))
        .agg(countDistinct(col("norm")).as("n_leaky_urls"),
          count(lit(1)).as("n_leaky_docs"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("fold"))
    },

    // K-ANONYMITY AUDIT (k = 5) over the quasi-identifier tuple
    // (lang, source, length bucket) — the re-identification check a
    // release pipeline runs beside PII scrubbing: the equivalence-
    // class size histogram plus a summary row (sz = -1) counting
    // classes and rows BELOW k. One ANSI text on both engines
    // (sqlSurface); the length bucket is pure integer arithmetic
    // (n - n % 100), so every count is exact. Scale shape: two
    // map-side-combined hash aggs (QI grouping, then size histogram)
    // — the second input is one row per CLASS, not per document.
    QueryDef.sqlSurface("q270_k_anonymity",
      """WITH classes AS (
        |  SELECT lang, source, n_chars - (n_chars % 100) AS len_bucket,
        |         CAST(count(*) AS BIGINT) AS sz
        |  FROM documents GROUP BY lang, source, n_chars - (n_chars % 100)),
        |hist AS (
        |  SELECT sz, CAST(count(*) AS BIGINT) AS n_classes,
        |         CAST(sum(sz) AS BIGINT) AS n_rows
        |  FROM classes GROUP BY sz),
        |viol AS (
        |  SELECT CAST(-1 AS BIGINT) AS sz,
        |         CAST(coalesce(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_classes,
        |         CAST(coalesce(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END), 0) AS BIGINT) AS n_rows
        |  FROM classes)
        |SELECT sz, n_classes, n_rows FROM hist
        |UNION ALL SELECT sz, n_classes, n_rows FROM viol
        |ORDER BY sz""".stripMargin,
      Seq("documents"))
  )
}
