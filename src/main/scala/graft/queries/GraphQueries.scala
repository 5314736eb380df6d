package graft.queries

import graft.operators.PageRank
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Graph-centrality curation gates (SURVEY §2.3 similarity family):
  * PageRank over the q148 mutual-kNN similarity graph — centrality-
  * weighted data selection, with the rank computed in EXACT integer
  * micro-units so a fixed iteration count is hash-comparable. The
  * edge derivation is shared verbatim with q148
  * ([[SimilarityQueries.mutualEdgesCte]] / `mutualKnnEdges`), so a
  * tuning change cannot fork the two gates. */
object GraphQueries {

  /** Fixed PageRank iterations for the gate. */
  private val Iters = 5

  /** Top-k rows reported. */
  private val TopN = 20

  /** Unrolled integer-PageRank oracle rounds: contribution
    * `(r·damp) // (100·deg)` (integer floor division — operands are
    * positive, so it matches Spark's truncating `DIV`), teleport
    * derived from the SAME [[PageRank.Unit0]]/[[PageRank.DampPct]]
    * constants the Spark side uses (so a damping change cannot fork
    * the two engines), every node re-emitted each round. The
    * `seedCond` variant confines the teleport term to the seed set
    * (q221 personalized/TrustRank form); `1=1` is the uniform q173
    * form. */
  private def prRounds(seedCond: String = "1=1"): String = {
    val teleport = PageRank.Unit0 * (100 - PageRank.DampPct) / 100
    (1 to Iters).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS MATERIALIZED (
         |  SELECT e2.nb AS id, sum((r.r * ${PageRank.DampPct}) // (100 * d.deg))::BIGINT AS c
         |  FROM edges e2 JOIN $prev r ON e2.id = r.id JOIN deg d ON d.id = e2.id
         |  GROUP BY e2.nb),
         |r$k AS MATERIALIZED (
         |  SELECT nodes.id,
         |         (CASE WHEN $seedCond THEN $teleport ELSE 0 END
         |          + coalesce(c, 0))::BIGINT AS r
         |  FROM nodes LEFT JOIN c$k USING (id))""".stripMargin
    }.mkString(",\n")
  }

  /** q221 seed set: the first [[SeedMax]] vector ids. */
  private val SeedMax = 10

  /** q231/q232 oracle unroll depth. The SPARK side runs to the true
    * fixpoint ([[graft.operators.GraphIter]] — convergence-probed, no
    * truncation); DuckDB cannot express fixpoint iteration over these
    * shapes cheaply, so the oracle unrolls a FIXED depth chosen well
    * past the fixture's convergence point (BFS levels past the
    * eccentricity are empty and contribute nothing; k-core rounds past
    * the fixpoint repeat the same census). A graph deeper than the
    * oracle unroll fails the HASH (Spark emits hops/rounds the oracle
    * lacks) — loud, never silent truncation. */
  private val BfsOracleRounds = 16

  /** q286: FIXED sync-LPA round count (both engines) — sync LPA can
    * oscillate, so fixed-iteration is the contract (GraphFrames'
    * maxIter), not a fixpoint probe. */
  private val LpaRounds = 4
  private val CoreOracleRounds = 12

  /** q232 k-core threshold. */
  private val CoreK = 3

  val defs: Seq[QueryDef] = Seq(

    // Similarity-graph centrality: 5 integer-PageRank rounds over the
    // mutual-kNN graph, top-20 by rank. Per round: one equi-join
    // shuffle on the source id + one map-side-combined sum on the
    // destination — nothing driver-side, rank frame checkpointed to
    // truncate the iterative lineage.
    QueryDef("q173_graph_pagerank",
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM edges GROUP BY id),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |r0 AS (SELECT id, 1000000::BIGINT AS r FROM nodes),
         |${prRounds()}
         |SELECT r$Iters.id AS vec_id, r$Iters.r AS rank_micro,
         |       coalesce(deg, 0)::BIGINT AS deg
         |FROM r$Iters LEFT JOIN deg USING (id)
         |ORDER BY rank_micro DESC, vec_id LIMIT $TopN""".stripMargin) {
      (spark, dir) =>
        val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
        val edges = mut.select(col("doc_a").as("id"), col("doc_b").as("nb"))
          .unionByName(mut.select(col("doc_b").as("id"), col("doc_a").as("nb")))
        val nodes = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id").as("id"))
        PageRank.ranks(nodes, edges, Iters)
          .select(col("id").as("vec_id"), col("rank_micro"), col("deg"))
          .orderBy(col("rank_micro").desc, col("vec_id"))
          .limit(TopN)
    },

    // TRIANGLE COUNTING + local clustering coefficient over the same
    // mutual-kNN graph — the graph-quality signal (community density
    // vs hub spam) curation pipelines read next to centrality. The
    // Spark side runs [[graft.operators.Triangles]]' DEGREE-ORDERED
    // enumeration (each edge oriented low-(degree, id) → high, which
    // bounds the wedge join's fan-out by the graph's arboricity — the
    // Chiba–Nishizeki orientation every distributed triangle system
    // uses); the oracle enumerates by id order (a<b), which counts
    // the identical triangles — orientation is result-invisible
    // (TrianglesSpec pins it, including on a degenerate hub graph).
    // Coefficient in exact basis points:
    // (10000·2·tri) DIV (deg·(deg−1)).
    QueryDef("q208_triangle_count",
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |tri AS (
         |  SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
         |  FROM mut e1 JOIN mut e2 ON e1.doc_b = e2.doc_a
         |       JOIN mut e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         |tn AS (SELECT id, count(*)::BIGINT AS n_tri FROM (
         |         SELECT unnest([x, y, z]) AS id FROM tri) u GROUP BY id),
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM edges GROUP BY id)
         |SELECT tn.id AS vec_id, deg, n_tri,
         |       ((10000 * 2 * n_tri) // (deg * (deg - 1)))::BIGINT AS coeff_bp
         |FROM tn JOIN deg USING (id)
         |ORDER BY n_tri DESC, vec_id LIMIT $TopN""".stripMargin) {
      (spark, dir) =>
        val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
        val e = mut.select(col("doc_a").as("a"), col("doc_b").as("b"))
        val tn = graft.operators.Triangles.perNodeDegreeOrdered(e)
        val deg = mut.select(col("doc_a").as("id"))
          .unionByName(mut.select(col("doc_b").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        tn.join(deg, Seq("id"))
          .select(col("id").as("vec_id"), col("deg"), col("n_tri"),
            expr("(10000L * 2 * n_tri) DIV (deg * (deg - 1))").as("coeff_bp"))
          .orderBy(col("n_tri").desc, col("vec_id"))
          .limit(TopN)
    },

    // PERSONALIZED PageRank (TrustRank): teleport confined to the
    // first-10-ids seed set, ranks = proximity to the trusted
    // examples — the "more like these" selection score. Same integer
    // rounds, edges, and plan shape as q173; the seed set joins in as
    // one broadcast-size left join per round.
    QueryDef("q221_personalized_pagerank",
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM edges GROUP BY id),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |r0 AS (SELECT id,
         |              (CASE WHEN id < $SeedMax THEN ${PageRank.Unit0} ELSE 0 END)::BIGINT AS r
         |       FROM nodes),
         |${prRounds(s"nodes.id < $SeedMax")}
         |SELECT r$Iters.id AS vec_id, r$Iters.r AS rank_micro,
         |       coalesce(deg, 0)::BIGINT AS deg
         |FROM r$Iters LEFT JOIN deg USING (id)
         |WHERE r$Iters.r > 0
         |ORDER BY rank_micro DESC, vec_id LIMIT $TopN""".stripMargin) {
      (spark, dir) =>
        val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
        val edges = mut.select(col("doc_a").as("id"), col("doc_b").as("nb"))
          .unionByName(mut.select(col("doc_b").as("id"), col("doc_a").as("nb")))
        val nodes = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id").as("id"))
        val seeds = nodes.where(col("id") < SeedMax)
        PageRank.personalizedRanks(nodes, edges, seeds, Iters)
          .where(col("rank_micro") > 0)
          .select(col("id").as("vec_id"), col("rank_micro"), col("deg"))
          .orderBy(col("rank_micro").desc, col("vec_id"))
          .limit(TopN)
    },

    // LINK PREDICTION over the same mutual-kNN graph: non-edges ranked
    // by common-neighbor count and Jaccard overlap (Liben-Nowell &
    // Kleinberg 2003) — the "these two clusters are about to merge"
    // signal incremental dedup maintenance reads, and the classic
    // candidate generator for graph completion. 2-paths enumerate via
    // ONE self-equi-join of the directed edge list on the midpoint
    // (same shape and arboricity note as q208's triangle join: at
    // scale, orient by degree to bound the per-midpoint fan-out),
    // existing edges removed with a LEFT ANTI join on the id-ordered
    // pair, Jaccard in exact basis points over the union size
    // deg(a)+deg(b)−cn.
    QueryDef("q225_link_prediction",
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM edges GROUP BY id),
         |p2 AS (
         |  SELECT e1.nb AS x, e2.nb AS z, count(*)::BIGINT AS cn
         |  FROM edges e1 JOIN edges e2 ON e1.id = e2.id AND e1.nb < e2.nb
         |  GROUP BY e1.nb, e2.nb),
         |cand AS (
         |  SELECT x, z, cn FROM p2
         |  WHERE cn >= 2
         |    AND NOT EXISTS (SELECT 1 FROM mut
         |                    WHERE doc_a = x AND doc_b = z))
         |SELECT x AS vec_a, z AS vec_b, cn AS common_neighbors,
         |       ((10000 * cn) // (da.deg + dz.deg - cn))::BIGINT AS jaccard_bp
         |FROM cand JOIN deg da ON da.id = x JOIN deg dz ON dz.id = z
         |ORDER BY common_neighbors DESC, jaccard_bp DESC, vec_a, vec_b
         |LIMIT $TopN""".stripMargin) { (spark, dir) =>
      val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
      val edges = mut.select(col("doc_a").as("id"), col("doc_b").as("nb"))
        .unionByName(mut.select(col("doc_b").as("id"), col("doc_a").as("nb")))
      val deg = edges.groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val p2 = edges.as("e1")
        .join(edges.as("e2"),
          col("e1.id") === col("e2.id") && col("e1.nb") < col("e2.nb"))
        .groupBy(col("e1.nb").as("x"), col("e2.nb").as("z"))
        .agg(count(lit(1)).as("cn"))
      val cand = p2.where(col("cn") >= 2)
        .join(mut, p2("x") === mut("doc_a") && p2("z") === mut("doc_b"),
          "left_anti")
      cand.join(deg.as("da"), col("x") === col("da.id"))
        .join(deg.as("dz"), col("z") === col("dz.id"))
        .select(col("x").as("vec_a"), col("z").as("vec_b"),
          col("cn").as("common_neighbors"),
          expr("(10000L * cn) DIV (da.deg + dz.deg - cn)").as("jaccard_bp"))
        .orderBy(col("common_neighbors").desc, col("jaccard_bp").desc,
          col("vec_a"), col("vec_b"))
        .limit(TopN)
    },

    // BFS hop distances from the q221 seed set, run to the TRUE
    // fixpoint: [[graft.operators.GraphIter.bfsDistances]] iterates
    // until the first-visit frontier empties (the convergence-probed
    // CC discipline — a fixed unroll silently truncates any graph
    // deeper than the bound; GraphIterSpec proves the old 4-round
    // form truncates a chain graph this form walks exactly). Per
    // round: ONE frontier-keyed equi-join + distinct + anti-join
    // against visited, frontier/visited checkpointed per round.
    // Output is the per-hop census (count + id checksum), so one node
    // at a wrong distance fails the hash; the oracle unrolls
    // [[BfsOracleRounds]] levels — past the fixture's eccentricity,
    // where further levels add nothing.
    QueryDef("q231_bfs_hops", {
      val levels = (1 to BfsOracleRounds).map { k =>
        s"""l$k AS MATERIALIZED (SELECT DISTINCT e$k.nb AS id
           |  FROM edges e$k JOIN l${k - 1} ON e$k.id = l${k - 1}.id)"""
          .stripMargin
      }.mkString(",\n")
      val union = (0 to BfsOracleRounds)
        .map(k => s"SELECT id, $k AS d FROM l$k").mkString("\nUNION ALL\n")
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |l0 AS (SELECT vec_id AS id FROM embeddings WHERE vec_id < $SeedMax),
         |$levels,
         |alls AS ($union),
         |dist AS (SELECT id, min(d) AS d FROM alls GROUP BY id)
         |SELECT d AS hops, count(*) AS n_nodes,
         |       CAST(sum(id) AS BIGINT) AS id_sum
         |FROM dist GROUP BY d ORDER BY hops""".stripMargin
    }) { (spark, dir) =>
      val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
      val edges = mut.select(col("doc_a").as("id"), col("doc_b").as("nb"))
        .unionByName(mut.select(col("doc_b").as("id"), col("doc_a").as("nb")))
      val l0 = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").as("id")).where(col("id") < SeedMax)
      graft.operators.GraphIter.bfsDistances(l0, edges)
        .groupBy(col("d")).agg(count(lit(1)).as("n_nodes"),
          sum(col("id")).cast("long").as("id_sum"))
        .select(col("d").as("hops"), col("n_nodes"), col("id_sum"))
        .orderBy(col("hops"))
    },

    // K-CORE decomposition ([[CoreK]]-core) peeled to the TRUE
    // fixpoint: [[graft.operators.GraphIter.kcoreFixpoint]] drops
    // nodes with degree < K and restricts edges to survivors until
    // two consecutive rounds agree — an EXACT probe, since the
    // monotone shrink makes equal counts equal sets (no fingerprint
    // collision possible). The gate emits the fixpoint census PLUS
    // the rounds-to-converge, which the oracle recovers as the first
    // unrolled round whose census equals the deep round's
    // ([[CoreOracleRounds]], past any fixture's peel depth) — so a
    // truncated Spark loop OR a wrong convergence count fails the
    // hash. Per round: one degree agg + two semi-joins, all
    // equi-keyed, frames checkpointed per round.
    QueryDef("q232_kcore", {
      // MATERIALIZED is load-bearing: each round references the
      // previous CTE three times — inlined, the tree quintuples per
      // round (the prRounds lesson)
      val rounds = (1 to CoreOracleRounds).map { r =>
        s"""d$r AS MATERIALIZED (SELECT id, count(*)::BIGINT AS dg FROM (
           |    SELECT a AS id FROM e${r - 1}
           |    UNION ALL SELECT b FROM e${r - 1}) u$r GROUP BY id),
           |k$r AS MATERIALIZED (SELECT id FROM d$r WHERE dg >= $CoreK),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
           |        WHERE a IN (SELECT id FROM k$r)
           |          AND b IN (SELECT id FROM k$r))""".stripMargin
      }.mkString(",\n")
      val union = (1 to CoreOracleRounds).map { r =>
        s"""SELECT $r AS round,
           |  (SELECT count(*) FROM k$r) AS n_nodes,
           |  (SELECT count(*) FROM e$r) AS n_edges,
           |  (SELECT coalesce(CAST(sum(id) AS BIGINT), 0) FROM k$r) AS id_sum"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |e0 AS (SELECT doc_a AS a, doc_b AS b FROM mut),
         |$rounds,
         |census AS ($union),
         |fix AS (SELECT n_nodes, n_edges, id_sum FROM census
         |        WHERE round = $CoreOracleRounds)
         |SELECT CAST((SELECT min(round) FROM census c, fix f
         |             WHERE c.n_nodes = f.n_nodes AND c.n_edges = f.n_edges
         |               AND c.id_sum = f.id_sum) AS BIGINT) AS n_rounds,
         |       CAST(n_nodes AS BIGINT) AS n_nodes,
         |       CAST(n_edges AS BIGINT) AS n_edges,
         |       CAST(id_sum AS BIGINT) AS id_sum
         |FROM fix""".stripMargin
    }) { (spark, dir) =>
      val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
      val e0 = mut.select(col("doc_a").as("a"), col("doc_b").as("b"))
      val (keep, eFix, nRounds) =
        graft.operators.GraphIter.kcoreFixpoint(e0, CoreK)
      keep.agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("id")).cast("long"), lit(0L)).as("id_sum"))
        .crossJoin(eFix.agg(count(lit(1)).as("n_edges")))
        .select(lit(nRounds.toLong).as("n_rounds"), col("n_nodes"),
          col("n_edges"), col("id_sum"))
    },

    // LABEL-PROPAGATION community detection (the Raghavan et al.
    // algorithm GraphFrames ships as `labelPropagation`) over the
    // shared mutual-kNN graph — the community rung of the graph
    // family (CC answers "connected?", LPA answers "densely knit?").
    // Synchronous LPA with deterministic ties (max neighbor-label
    // frequency, then MIN label) for a FIXED [[LpaRounds]] rounds in
    // both engines: sync LPA on bipartite-ish structures can
    // oscillate forever, so fixed-iteration IS the standard contract
    // (GraphFrames' maxIter) — unlike the monotone BFS/k-core loops
    // (q231/q232), a fixpoint probe would not terminate on all
    // inputs. Isolated nodes keep their own label. Per round: one
    // equi-join of edges against the O(nodes) label frame + a
    // per-node argmax window, frames checkpointed per round; the
    // kNN build is memoized across the graph family.
    QueryDef("q286_lpa_communities", {
      val rounds = (1 to LpaRounds).map { r =>
        s"""c$r AS MATERIALIZED (
           |  SELECT e.nb AS id, l${r - 1}.lab AS lab, count(*)::BIGINT AS c
           |  FROM edges e JOIN l${r - 1} ON e.id = l${r - 1}.id
           |  GROUP BY e.nb, l${r - 1}.lab),
           |b$r AS MATERIALIZED (SELECT id, lab FROM (
           |  SELECT id, lab,
           |         row_number() OVER (PARTITION BY id ORDER BY c DESC, lab) AS rn
           |  FROM c$r) t$r WHERE rn = 1),
           |l$r AS MATERIALIZED (
           |  SELECT n.id, coalesce(b$r.lab, n.lab) AS lab
           |  FROM l${r - 1} n LEFT JOIN b$r ON b$r.id = n.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${SimilarityQueries.mutualEdgesCte},
         |l0 AS (SELECT vec_id AS id, vec_id AS lab FROM embeddings),
         |$rounds
         |SELECT lab AS community, count(*)::BIGINT AS n_nodes,
         |       CAST(min(id) AS BIGINT) AS min_id,
         |       CAST(sum(id) AS BIGINT) AS id_sum
         |FROM l$LpaRounds GROUP BY lab ORDER BY community""".stripMargin
    }) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val mut = SimilarityQueries.mutualKnnEdges(spark, dir)
      val edges = FrameMemo.checkpointed(
        mut.select(col("doc_a").as("id"), col("doc_b").as("nb"))
          .unionByName(mut.select(col("doc_b").as("id"),
            col("doc_a").as("nb"))))
      var labels = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("vec_id").as("lab"))
      val w = Window.partitionBy(col("nb")).orderBy(col("c").desc, col("lab"))
      (1 to LpaRounds).foreach { _ =>
        val best = edges.join(labels, "id")
          .groupBy(col("nb"), col("lab")).agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("nb").as("id"), col("lab").as("newlab"))
        labels = FrameMemo.checkpointed(labels.join(best, Seq("id"), "left")
          .select(col("id"), coalesce(col("newlab"), col("lab")).as("lab")))
      }
      labels.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("id")).cast("long").as("min_id"),
          sum(col("id")).cast("long").as("id_sum"))
        .orderBy(col("community"))
    }
  )
}
