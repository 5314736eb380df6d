package graft.queries

import graft.functions.GraftFunctions
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval re-ranking + the remaining ANN compression/search rungs
  * (SURVEY §2.3 similarity family). No reference implementation;
  * driver-mandated pipeline extensions:
  *
  *  - q262 MMR (maximal marginal relevance, Carbonell & Goldstein
  *    1998): greedy diversified top-k over a relevance shortlist —
  *    the selection pass that keeps retrieved training/eval context
  *    from collapsing onto near-duplicates.
  *  - q263 1-bit (sign) embedding quantization with Hamming-distance
  *    shortlisting and exact re-rank — the 32x-compression rung of
  *    the quantization ladder (beside SQ8 q202, PQ q0b, b-bit
  *    MinHash q256), i.e. binary quantization as vector databases
  *    ship it.
  *  - q266 graph-based ANN: beam search over the mutual-kNN graph
  *    (the HNSW/NSW family's search primitive, on the q148 graph the
  *    repo already maintains).
  *  - q268 matryoshka-style prefix-dimension recall curve: recall@10
  *    of brute-force search truncated to the first 16/32/64
  *    dimensions — the budget-vs-recall table for adaptive-dimension
  *    retrieval (Kusupati et al. 2022), beside the JL-projection
  *    gate's random-subspace variant.
  *
  * All similarity arithmetic is the repo-wide left-to-right double
  * fold (bit-exact vs the DuckDB oracle), ties break on the neighbor
  * id, and counters/ranks are BIGINT — every gate is a full hash
  * compare.
  *
  * Scale shape: every frame after the one corpus scan is
  * O(queries x shortlist) — the corpus is never self-joined. The
  * greedy MMR/beam rounds iterate on frames bounded by the shortlist
  * and beam widths (driver sequences the rounds but never holds
  * rows), each round checkpointed through [[FrameMemo.checkpointed]]
  * so the iterative lineage stays flat. The binary signatures pack
  * into two BIGINTs per vector (32x smaller than float32 at Dim=64),
  * so the Hamming scan streams long pairs through codegen'd
  * `bit_count(xor)` — the exact plan a 100 TB corpus wants: cheap
  * coarse pass over packed bits, exact re-rank only on the
  * shortlist.
  */
object RerankQueries {

  private val Dim = SimilarityQueries.Dim
  private val NumQueries = 5

  // q262 MMR
  private val ShortN = 20
  private val MmrK = 5

  // q263 binary quantization
  private val HamShort = 30
  private val TopK = 10

  // q266 beam search
  private val BeamB = 12
  private val BeamRounds = 4

  /** Beam-search entry set: the [[BeamEntries]] highest-degree nodes
    * (ties to the lower id) — multiple entries keep the search from
    * stranding in one small graph component, the same role HNSW's
    * upper layers play. */
  private val BeamEntries = 4

  // q268 matryoshka budgets
  private val MatDims = Seq(16, 32, 64)

  // ---- shared Spark-side helpers (same conventions as
  // [[SimilarityQueries]]: query frame broadcast from its own pruned
  // scan, corpus spread across cores before the CPU-bound folds) ----

  private def dot(a: Column, b: Column): Column = GraftFunctions.vec_dot(a, b)

  private def normed(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    normed(Tables.load(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism))

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    broadcast(normed(
      Tables.load(spark, dir, "embeddings").where(col("vec_id") < NumQueries))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm")))

  private def cosine(qv: Column, v: Column, qn: Column, n: Column): Column =
    dot(qv, v) / (qn * n)

  // ---- shared oracle fragments ----------------------------------------

  /** `q` (qid, qv, qnrm) + `sims` (qid, nid, sim) over [[normedCte]]. */
  private def simsCte: String =
    s"""q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n WHERE vec_id < $NumQueries),
       |sims AS (
       |  SELECT qid, n.vec_id AS nid,
       |         list_aggregate([qv[i]*v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm * n.nrm) AS sim
       |  FROM q, n)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // MAXIMAL MARGINAL RELEVANCE re-rank: relevance shortlist of 20
    // per query (exact cosine), then 5 greedy rounds of
    // argmax(0.7*sim(q,d) - 0.3*max_{s in S} sim(d,s)). Round 1 is
    // the raw top hit; each later round joins the (shortlist x
    // selected) pair frame, takes the per-candidate max diversity
    // penalty, and picks the per-query argmax (ties to the lower
    // id). Every post-scan frame is O(queries x shortlist^2) and the
    // rounds iterate on checkpointed frames of <= 25 rows.
    QueryDef("q262_mmr_rerank", {
      val rounds = (2 to MmrK).map { r =>
        val prev = s"a${r - 1}"
        s"""c$r AS (SELECT s.qid, s.nid, s.sim FROM short s
           |  WHERE NOT EXISTS (SELECT 1 FROM $prev
           |                    WHERE $prev.qid = s.qid AND $prev.nid = s.nid)),
           |m$r AS (
           |  SELECT c.qid, c.nid, c.sim, max(p.dsim) AS maxd
           |  FROM c$r c JOIN pp p ON p.qid = c.qid AND p.na = c.nid
           |       JOIN $prev ON $prev.qid = p.qid AND $prev.nid = p.nb
           |  GROUP BY c.qid, c.nid, c.sim),
           |s$r AS (
           |  SELECT qid, nid, score, CAST($r AS BIGINT) AS pos FROM (
           |    SELECT qid, nid, 0.7*sim - 0.3*maxd AS score,
           |           row_number() OVER (PARTITION BY qid
           |             ORDER BY 0.7*sim - 0.3*maxd DESC, nid) AS rn
           |    FROM m$r) z WHERE rn = 1),
           |a$r AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM s$r)"""
          .stripMargin
      }.mkString(",\n")
      s"""${SimilarityQueries.normedCte},
         |$simsCte,
         |short AS MATERIALIZED (
         |  SELECT qid, nid, sim FROM (
         |    SELECT qid, nid, sim,
         |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |    FROM sims) t WHERE rn <= $ShortN),
         |pp AS MATERIALIZED (
         |  SELECT sa.qid, sa.nid AS na, sb.nid AS nb,
         |         list_aggregate([va.v[i]*vb.v[i] for i in generate_series(1, $Dim)], 'sum')
         |           / (va.nrm * vb.nrm) AS dsim
         |  FROM short sa JOIN short sb ON sa.qid = sb.qid AND sa.nid <> sb.nid
         |       JOIN n va ON va.vec_id = sa.nid
         |       JOIN n vb ON vb.vec_id = sb.nid),
         |a1 AS MATERIALIZED (
         |  SELECT qid, nid, sim AS score, CAST(1 AS BIGINT) AS pos FROM (
         |    SELECT qid, nid, sim,
         |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
         |    FROM short) t WHERE rn = 1),
         |$rounds
         |SELECT qid, pos, nid, score FROM a$MmrK ORDER BY qid, pos""".stripMargin
    }) { (spark, dir) =>
      GraftFunctions.register(spark)
      val ckpt = FrameMemo.checkpointed _
      val e = corpus(spark, dir)
      val q = queriesDf(spark, dir)
      val sims = q.crossJoin(e).select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
      val wq = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      val short = ckpt(sims.withColumn("rn", row_number().over(wq))
        .where(col("rn") <= ShortN).drop("rn"))
      val sv = short.join(e, short("nid") === e("vec_id"))
        .select(col("qid"), col("nid"), col("sim"), col("v"), col("nrm"))
      val pp = ckpt(sv.as("sa").join(sv.as("sb"),
          col("sa.qid") === col("sb.qid") && col("sa.nid") =!= col("sb.nid"))
        .select(col("sa.qid").as("qid"), col("sa.nid").as("na"),
          col("sb.nid").as("nb"),
          cosine(col("sa.v"), col("sb.v"), col("sa.nrm"), col("sb.nrm"))
            .as("dsim")))
      val first = short.withColumn("rn", row_number().over(wq))
        .where(col("rn") === 1)
        .select(col("qid"), col("nid"), col("sim").as("score"),
          lit(1L).as("pos"))
      var acc = ckpt(first)
      for (r <- 2 to MmrK) {
        val cand = short.join(acc, Seq("qid", "nid"), "left_anti")
        val maxd = cand.join(pp, cand("qid") === pp("qid") &&
            cand("nid") === pp("na"))
          .join(acc.select(col("qid").as("aqid"), col("nid").as("anid")),
            pp("qid") === col("aqid") && pp("nb") === col("anid"))
          .groupBy(cand("qid").as("qid"), cand("nid").as("nid"),
            cand("sim").as("sim"))
          .agg(max(col("dsim")).as("maxd"))
        val score = lit(0.7) * col("sim") - lit(0.3) * col("maxd")
        val ws = Window.partitionBy(col("qid")).orderBy(score.desc, col("nid"))
        val pick = maxd.withColumn("rn", row_number().over(ws))
          .where(col("rn") === 1)
          .select(col("qid"), col("nid"), score.as("score"),
            lit(r.toLong).as("pos"))
        acc = ckpt(acc.unionByName(pick))
      }
      acc.orderBy(col("qid"), col("pos"))
    },

    // 1-BIT (SIGN) EMBEDDING QUANTIZATION + HAMMING RE-RANK: each
    // vector packs to two BIGINTs (bit i = sign of dimension i), the
    // coarse pass ranks the corpus by Hamming distance to the query
    // signature (codegen'd bit_count(xor) over packed longs — 16
    // bytes/vector instead of 512), the top-30 shortlist re-ranks by
    // exact cosine, top-10 out. The asymmetric-distance refinement
    // and the recall story mirror the SQ8/PQ gates; at 100 TB the
    // signature column is the only corpus-wide scan.
    QueryDef("q263_binary_hamming_rerank", {
      def sigSql(base: Int, out: String): String =
        s"""$out AS (
           |  SELECT vec_id,
           |         CAST(list_aggregate([CASE WHEN v[i + $base] >= 0
           |           THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END
           |           for i in generate_series(1, 32)], 'sum') AS BIGINT) AS s
           |  FROM n)"""
      s"""${SimilarityQueries.normedCte},
         |${sigSql(0, "slo")},
         |${sigSql(32, "shi")},
         |sg AS (SELECT slo.vec_id, slo.s AS lo, shi.s AS hi
         |       FROM slo JOIN shi USING (vec_id)),
         |qs AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi FROM sg
         |       WHERE vec_id < $NumQueries),
         |ham AS (
         |  SELECT qid, sg.vec_id AS nid,
         |         (bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)))::BIGINT AS ham
         |  FROM qs, sg),
         |short AS (
         |  SELECT qid, nid, ham FROM (
         |    SELECT qid, nid, ham,
         |           row_number() OVER (PARTITION BY qid ORDER BY ham, nid) AS rn
         |    FROM ham) t WHERE rn <= $HamShort),
         |$simsCte
         |SELECT qid, nid, ham, sim, rank FROM (
         |  SELECT s.qid, s.nid, s.ham, m.sim,
         |         CAST(row_number() OVER (PARTITION BY s.qid
         |           ORDER BY m.sim DESC, s.nid) AS BIGINT) AS rank
         |  FROM short s JOIN sims m ON m.qid = s.qid AND m.nid = s.nid) z
         |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
    }) { (spark, dir) =>
      GraftFunctions.register(spark)
      val e = corpus(spark, dir)
      def sig(base: Int): Column = expr(
        s"""aggregate(sequence(1, 32), 0L, (acc, i) ->
           |  acc + IF(element_at(v, i + $base) >= 0D,
           |           shiftleft(1L, i - 1), 0L))""".stripMargin)
      val sg = e.select(col("vec_id"), col("v"), col("nrm"),
        sig(0).as("lo"), sig(32).as("hi"))
      val qs = broadcast(sg.where(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qnrm"), col("lo").as("qlo"), col("hi").as("qhi")))
      val ham = qs.crossJoin(sg)
        .select(col("qid"), col("vec_id").as("nid"), col("qv"), col("qnrm"),
          col("v"), col("nrm"),
          (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
            bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("ham"))
      val wh = Window.partitionBy(col("qid")).orderBy(col("ham"), col("nid"))
      val short = ham.withColumn("rn", row_number().over(wh))
        .where(col("rn") <= HamShort)
      val wr = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid"))
      short
        .select(col("qid"), col("nid"), col("ham"),
          cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rank") <= TopK)
        .orderBy(col("qid"), col("rank"))
    },

    // GRAPH-BASED ANN (the NSW/HNSW search primitive): greedy beam
    // search over the q148 mutual-kNN graph. Entry set = the 4
    // highest-degree nodes (ties to the lower id); each of the 4
    // rounds expands the beam's neighbors, scores candidates by
    // exact cosine, and keeps the best 12 (ties to the lower id);
    // top-10 of the final beam reported. A fixed round count IS the
    // algorithm here (bounded-hop greedy search, not a truncated
    // fixpoint — recall is the tunable, as in every HNSW efSearch
    // knob); RerankSpec pins the beam-width/round invariants. Per
    // round: one edge equi-join + one corpus equi-join on <= 48
    // candidate rows per query, frames checkpointed so the lineage
    // stays flat.
    QueryDef("q266_graph_ann_beam", {
      val rounds = (1 to BeamRounds).map { r =>
        val prev = s"b${r - 1}"
        s"""c$r AS (
           |  SELECT DISTINCT qid, id FROM (
           |    SELECT qid, id FROM $prev
           |    UNION ALL
           |    SELECT $prev.qid, e$r.nb AS id
           |    FROM $prev JOIN edges e$r ON e$r.id = $prev.id) u),
           |b$r AS MATERIALIZED (
           |  SELECT qid, id, sim FROM (
           |    SELECT c.qid, c.id,
           |           list_aggregate([q.qv[i]*n.v[i] for i in generate_series(1, $Dim)], 'sum')
           |             / (q.qnrm * n.nrm) AS sim,
           |           row_number() OVER (PARTITION BY c.qid ORDER BY
           |             list_aggregate([q.qv[i]*n.v[i] for i in generate_series(1, $Dim)], 'sum')
           |               / (q.qnrm * n.nrm) DESC, c.id) AS rn
           |    FROM c$r c JOIN n ON n.vec_id = c.id
           |         JOIN q ON q.qid = c.qid) z
           |  WHERE rn <= $BeamB)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n
         |      WHERE vec_id < $NumQueries),
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM edges GROUP BY id),
         |entry AS (SELECT id FROM deg ORDER BY deg DESC, id LIMIT $BeamEntries),
         |b0 AS (SELECT qid, entry.id AS id, 0.0 AS sim FROM q, entry),
         |$rounds
         |SELECT qid, rank, nid, sim FROM (
         |  SELECT qid, id AS nid, sim,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY sim DESC, id) AS BIGINT) AS rank
         |  FROM b$BeamRounds) z
         |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
    }) { (spark, dir) =>
      GraftFunctions.register(spark)
      val ckpt = FrameMemo.checkpointed _
      val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
      val edges = mut.select(col("doc_a").as("id"), col("doc_b").as("nb"))
        .unionByName(mut.select(col("doc_b").as("id"), col("doc_a").as("nb")))
      val e = corpus(spark, dir)
      val q = queriesDf(spark, dir)
      val entry = broadcast(edges.groupBy(col("id"))
        .agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("id")).limit(BeamEntries)
        .select(col("id")))
      var beam = ckpt(q.select(col("qid")).crossJoin(entry))
      for (_ <- 1 to BeamRounds) {
        val nbr = beam.join(edges, "id").select(col("qid"), col("nb").as("id"))
        val cand = beam.select(col("qid"), col("id")).unionByName(nbr).distinct()
        val scored = cand.join(e, cand("id") === e("vec_id"))
          .join(q, "qid")
          .select(col("qid"), col("id"),
            cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
        val wb = Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("id"))
        beam = ckpt(scored.withColumn("rn", row_number().over(wb))
          .where(col("rn") <= BeamB).drop("rn"))
      }
      val wr = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
      beam.withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("id").as("nid"), col("sim"))
        .orderBy(col("qid"), col("rank"))
    },

    // MATRYOSHKA PREFIX-DIMENSION RECALL CURVE: recall@10 (vs the
    // full-dim exact top-10) of brute-force cosine search truncated
    // to the first 16/32/64 dimensions — the dimension-budget
    // operating table for adaptive retrieval, complementing the
    // random-subspace JL gate. Exact integer recall in basis points;
    // at dim=64 the curve's last row is recall 10000 by
    // construction (self-check built into the gate).
    QueryDef("q268_matryoshka_recall", {
      def truncTopK(d: Int, tag: String, out: String): String =
        s"""t$tag AS (
           |  SELECT vec_id, sqrt(list_aggregate([v[i]*v[i]
           |    for i in generate_series(1, $d)], 'sum')) AS pn, v FROM e2),
           |q$tag AS (SELECT vec_id AS qid, v AS qv, pn AS qn FROM t$tag
           |        WHERE vec_id < $NumQueries),
           |$out AS (
           |  SELECT qid, nid FROM (
           |    SELECT qid, t.vec_id AS nid,
           |           row_number() OVER (PARTITION BY qid ORDER BY
           |             list_aggregate([qv[i]*v[i] for i in generate_series(1, $d)], 'sum')
           |               / (qn * t.pn) DESC, t.vec_id) AS rn
           |    FROM q$tag q, t$tag t) z WHERE rn <= $TopK)"""
      val blocks =
        MatDims.map(d => truncTopK(d, d.toString, s"k$d")).mkString(",\n")
      val union = MatDims.map { d =>
        s"""SELECT CAST($d AS BIGINT) AS dim_budget,
           |  (SELECT count(*) FROM k$d JOIN kfull
           |   ON k$d.qid = kfull.qid AND k$d.nid = kfull.nid)::BIGINT AS n_hits"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${truncTopK(Dim, "f", "kfull")},
         |$blocks,
         |hits AS ($union)
         |SELECT dim_budget, n_hits,
         |       (10000 * n_hits) // ${NumQueries * TopK} AS recall_bp
         |FROM hits ORDER BY dim_budget""".stripMargin
    }) { (spark, dir) =>
      GraftFunctions.register(spark)
      val raw = Tables.load(spark, dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      def topk(d: Int): DataFrame = {
        val t = raw.select(col("vec_id"), col("v"),
          sqrt(dot(slice(col("v"), 1, d), slice(col("v"), 1, d))).as("pn"))
        val q = broadcast(t.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("pn").as("qn")))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("nid"))
        q.crossJoin(t)
          .select(col("qid"), col("vec_id").as("nid"),
            (dot(slice(col("qv"), 1, d), slice(col("v"), 1, d)) /
              (col("qn") * col("pn"))).as("sim"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= TopK)
          .select(col("qid"), col("nid"))
      }
      val full = FrameMemo.checkpointed(topk(Dim))
      MatDims.map { d =>
        topk(d).join(full, Seq("qid", "nid"), "left_semi")
          .agg(count(lit(1)).cast("long").as("n_hits"))
          .select(lit(d.toLong).as("dim_budget"), col("n_hits"),
            expr(s"(10000 * n_hits) DIV ${NumQueries * TopK}")
              .as("recall_bp"))
      }.reduce(_ unionByName _).orderBy(col("dim_budget"))
    },

    // LATE-INTERACTION (ColBERT MaxSim) scoring: each 64-dim vector is
    // treated as 4 token vectors of 16 dims and score(q, d) =
    // Σ_{query token} max_{doc token} ⟨qt, dt⟩ — the multi-vector
    // retrieval model where a document matches if EVERY query aspect
    // finds its best-matching doc aspect. Coordinates quantize to
    // exact integers (floor(x·2^14), the SQ8-family convention) so
    // all 16 dots per pair are order-free BIGINTs. Scale shape: the
    // 5-query token set rides along broadcast and the whole 4×4
    // dot/max/sum block is ONE per-(doc, query) row expression — the
    // corpus is scanned once, zero pre-rank shuffle, and only the
    // per-query top-5 crosses the exchange.
    QueryDef("q280_maxsim_rerank", {
      val NT = 4; val TD = 16
      s"""WITH e AS (SELECT vec_id,
         |             [CAST(floor(x * 16384) AS BIGINT) for x in embedding::DOUBLE[]] AS v
         |           FROM embeddings),
         |tok AS (SELECT vec_id, t, list_slice(v, t*$TD + 1, t*$TD + $TD) AS tv
         |        FROM e CROSS JOIN generate_series(0, ${NT - 1}) g(t)),
         |qt AS (SELECT vec_id AS qid, t AS qtk, tv AS qtv FROM tok WHERE vec_id < $NumQueries),
         |dots AS (
         |  SELECT qid, tok.vec_id AS nid, qtk,
         |         max(list_aggregate([qtv[i]*tv[i] for i in generate_series(1, $TD)], 'sum')) AS best
         |  FROM qt, tok GROUP BY qid, tok.vec_id, qtk),
         |sc AS (SELECT qid, nid, sum(best)::BIGINT AS maxsim FROM dots GROUP BY qid, nid)
         |SELECT qid, nid, maxsim, rank FROM (
         |  SELECT qid, nid, maxsim,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY maxsim DESC, nid) AS BIGINT) AS rank
         |  FROM sc) t
         |WHERE rank <= $MmrK ORDER BY qid, rank""".stripMargin
    }) { (spark, dir) =>
      val NT = 4; val TD = 16
      val qvec = transform(col("embedding").cast("array<double>"),
        x => floor(x * 16384))
      val e = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), qvec.as("v"))
        .repartition(spark.sparkContext.defaultParallelism)
      val q = broadcast(Tables.load(spark, dir, "embeddings")
        .where(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), qvec.as("qv")))
      val dotQ = (a: Column, b: Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      val score = aggregate(
        transform(sequence(lit(0), lit(NT - 1)), qt =>
          array_max(transform(sequence(lit(0), lit(NT - 1)), dt =>
            dotQ(slice(col("qv"), qt * TD + 1, lit(TD)),
              slice(col("v"), dt * TD + 1, lit(TD)))))),
        lit(0L), (acc, x) => acc + x)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("maxsim").desc, col("nid"))
      e.crossJoin(q)
        .select(col("qid"), col("vec_id").as("nid"), score.as("maxsim"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= MmrK)
        .orderBy(col("qid"), col("rank"))
    },

    // NDCG@10 — the GRADED ranking-quality metric the retrieval-eval
    // family (recall curves q115/q218/q268, hit-based eval q152) still
    // lacked: positions discount by 1/log2(i+1), so a relevant doc at
    // rank 1 counts ~3.5× one at rank 10. Relevance = label match
    // (the embeddings fixture's cluster id). Position weights
    // pre-quantize to exact micro-units (floor(1e6/log2(i+1) + 0.5) —
    // ten fixed constants both engines compute identically, none near
    // a rounding boundary), so DCG/IDCG/NDCG are all exact BIGINT
    // arithmetic. Scale shape: the exact top-10 is the q26 brute
    // chain (broadcast queries, one corpus scan); everything after
    // operates on ≤ 10 rows per query.
    QueryDef("q293_ndcg_eval", {
      s"""${SimilarityQueries.normedCte},
         |$simsCte,
         |lb AS (SELECT vec_id, label FROM embeddings),
         |top AS (SELECT qid, nid, rank FROM (
         |    SELECT qid, nid,
         |           CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
         |    FROM sims) t
         |  WHERE rank <= $TopK),
         |wt AS (SELECT i, CAST(floor(1000000 / log2(i + 1) + 0.5) AS BIGINT) AS w
         |       FROM generate_series(1, $TopK) t(i)),
         |rel AS (SELECT t.qid, t.rank,
         |               CASE WHEN ql.label = dl.label THEN 1 ELSE 0 END AS r
         |        FROM top t JOIN lb ql ON ql.vec_id = t.qid
         |                   JOIN lb dl ON dl.vec_id = t.nid),
         |dcg AS (SELECT qid, CAST(sum(r * wt.w) AS BIGINT) AS dcg
         |        FROM rel JOIN wt ON wt.i = rel.rank GROUP BY qid),
         |nrel AS (SELECT q.qid, count(*)::BIGINT AS n_rel
         |         FROM q JOIN lb ql ON ql.vec_id = q.qid
         |                JOIN lb dl ON dl.label = ql.label
         |         GROUP BY q.qid),
         |idcg AS (SELECT n.qid, CAST(sum(wt.w) AS BIGINT) AS idcg
         |         FROM nrel n JOIN wt ON wt.i <= least($TopK, n.n_rel)
         |         GROUP BY n.qid)
         |SELECT d.qid, nrel.n_rel, d.dcg AS dcg_micro, idcg.idcg AS idcg_micro,
         |       ((10000 * d.dcg) // idcg.idcg)::BIGINT AS ndcg_bp
         |FROM dcg d JOIN nrel ON nrel.qid = d.qid JOIN idcg ON idcg.qid = d.qid
         |ORDER BY d.qid""".stripMargin
    }) { (spark, dir) =>
      val c = corpus(spark, dir)
      val q = queriesDf(spark, dir)
      val lb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid"))
      val top = q.crossJoin(c)
        .select(col("qid"), col("vec_id").as("nid"),
          cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= TopK)
      val wt = broadcast(spark.range(1, TopK + 1)
        .select(col("id").as("i"),
          expr("CAST(floor(1000000 / log2(CAST(id + 1 AS DOUBLE)) + 0.5) AS BIGINT)")
            .as("w")))
      val rel = top
        .join(lb.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
        .join(lb.select(col("vec_id").as("nid"), col("label").as("dl")), "nid")
        .select(col("qid"), col("rank"),
          when(col("ql") === col("dl"), 1L).otherwise(0L).as("r"))
      val dcg = rel.join(wt, rel("rank") === wt("i"))
        .groupBy(col("qid")).agg(sum(col("r") * col("w")).as("dcg_micro"))
      val lcnt = lb.groupBy(col("label")).agg(count(lit(1)).as("n_rel"))
      val nrel = q.select(col("qid"))
        .join(lb.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
        .join(lcnt, col("ql") === col("label"))
        .select(col("qid"), col("n_rel"))
      val idcg = nrel.join(wt, wt("i") <= least(lit(TopK.toLong), col("n_rel")))
        .groupBy(col("qid")).agg(sum(col("w")).as("idcg_micro"))
      dcg.join(nrel, "qid").join(idcg, "qid")
        .select(col("qid"), col("n_rel"), col("dcg_micro"), col("idcg_micro"),
          expr("(10000L * dcg_micro) DIV idcg_micro").as("ndcg_bp"))
        .orderBy(col("qid"))
    }
  )
}
