package graft.operators

import graft.queries.FrameMemo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convergence-driven graph iteration — BFS and k-core peeling run to
  * their FIXPOINT instead of a fixed unroll (the q60
  * connected-components discipline applied to the other two iterative
  * graph operators): a bounded unroll silently truncates on a graph
  * deeper than the bound, which no gate on a shallow fixture can
  * catch. Both probes here are EXACT, not fingerprints, because both
  * iterations are monotone:
  *
  *  - BFS: the frontier (first-visited nodes) eventually empties;
  *    empty frontier IS the fixpoint.
  *  - k-core: the surviving node set only shrinks (degrees never grow
  *    as edges are removed), so subset + equal cardinality = set
  *    equality — two consecutive rounds with the same census are the
  *    fixpoint, no hash collision possible.
  *
  * Per-round frames route through [[FrameMemo.checkpointed]] (each
  * round's frame is consumed 2-3 times and the plan tree would
  * multiply per round otherwise — the measured 288 s vs 36 s k-core
  * lesson), which honors `spark.graft.memo.reliable` for
  * fault-tolerant checkpoints on a real cluster. Driver state per
  * round is two scalar counts; everything else is user-keyed
  * equi-joins and map-side-combined degree aggs. `maxRounds` is a
  * runaway backstop (graph diameter / peel depth, not data size), and
  * hitting it fails loudly rather than returning a truncated answer.
  */
object GraphIter {

  /** First-visit BFS distances from `seeds` over directed `edges`
    * (id, nb): returns (id, d) with d = exact hop distance, one row
    * per REACHABLE node. Rounds = eccentricity of the seed set. */
  def bfsDistances(seeds: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    // only the per-round FRONTIER is checkpointed; `visited` stays a
    // plain union over those materialized leaves (re-checkpointing
    // the growing visited set each round re-writes O(n) rows per
    // round — measured 2x the whole loop's cost at sf0.1)
    var frontier = FrameMemo.checkpointed(
      seeds.select(col("id")).distinct().withColumn("d", lit(0L)))
    var visited = frontier
    var d = 0L
    var n = frontier.count()
    while (n > 0 && d < maxRounds) {
      d += 1
      // neighbors of the frontier not yet visited = this round's
      // first visits; the anti-join is what lets the frontier empty
      // on cyclic graphs (re-visits collapse to nothing)
      val next = FrameMemo.checkpointed(
        edges.join(frontier.select(col("id").as("fid")),
          col("id") === col("fid"))
          .select(col("nb").as("id")).distinct()
          .join(visited.select(col("id")), Seq("id"), "left_anti")
          .withColumn("d", lit(d)))
      visited = visited.unionByName(next)
      frontier = next
      n = next.count()
    }
    require(n == 0,
      s"bfsDistances: frontier still non-empty after $maxRounds rounds " +
        "— raise maxRounds (graph deeper than the backstop)")
    visited
  }

  /** Peel `edges0` (a, b) to the `k`-core fixpoint: repeatedly drop
    * nodes with degree < k and restrict edges to survivors, until two
    * consecutive rounds have identical (node, edge) counts — which,
    * by monotone shrink, is set equality. Returns (surviving node
    * ids, surviving edges, rounds-to-fixpoint); the confirming round
    * is not counted. A graph whose k-core is empty converges to
    * (empty, empty) naturally. */
  def kcoreFixpoint(edges0: DataFrame, k: Int,
      maxRounds: Int = 64): (DataFrame, DataFrame, Int) = {
    var e = FrameMemo.checkpointed(edges0.select(col("a"), col("b")))
    var keep = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
    var prev = (-1L, -1L)
    var rounds = 0
    var converged = false
    while (!converged && rounds <= maxRounds) {
      val deg = e.select(col("a").as("id"))
        .unionByName(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dg"))
      val k2 = FrameMemo.checkpointed(
        deg.where(col("dg") >= k).select(col("id")))
      val e2 = FrameMemo.checkpointed(
        e.join(k2.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(k2.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
      val counts = (k2.count(), e2.count())
      if (counts == prev) converged = true // confirming round: frames identical
      else {
        rounds += 1
        prev = counts
        keep = k2
        e = e2
      }
    }
    require(converged,
      s"kcoreFixpoint: still peeling after $maxRounds rounds — " +
        "raise maxRounds (peel depth exceeded the backstop)")
    (keep, e, rounds)
  }
}
