package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Brin & Page 1998, "The Anatomy of a
  * Large-Scale Hypertextual Web Search Engine") in EXACT integer
  * arithmetic — the graph-centrality scorer a curation pipeline uses
  * to weight documents by how central they are in a similarity or
  * link graph (the same role OpenWebText-style pipelines give link
  * karma, and SemDeDup-adjacent selection gives embedding-graph
  * centrality). No reference implementation (the reference ships only
  * the median UDA); driver-mandated LLM-pipeline extension.
  *
  * Design for 100 TB:
  *
  *  - **One shuffle per iteration.** Each round is
  *    `edges ⋈ ranks` on the source id (co-partitioned with the
  *    degree frame) followed by a map-side-combined sum keyed on the
  *    destination — the textbook scatter/gather expressed as two
  *    hash exchanges Catalyst already knows how to pipeline. Nothing
  *    is collected to the driver.
  *  - **Exact integer micro-ranks.** Ranks live in micro-units
  *    (r0 = 1,000,000); each contribution is
  *    `(r * dampBp) DIV (100 * deg)` — a single integer truncating
  *    division both engines evaluate identically, making the
  *    fixed-iteration result hash-exact and partitioning-invariant
  *    (float PageRank sums differ run-to-run across partitionings).
  *    Truncation loss is bounded by 1 micro-unit per in-edge per
  *    round — noise at rank magnitudes, and identically replayed by
  *    the oracle.
  *  - **Lineage truncation.** The rank frame is checkpointed each
  *    round via [[graft.queries.FrameMemo.checkpointed]]; iterative
  *    plans otherwise grow superlinearly in the optimizer
  *    ([[graft.queries.NearDupQueries]] learned the same lesson for
  *    its connected-components loop). Setting
  *    `spark.graft.memo.reliable=true` routes every round through the
  *    reliable checkpoint dir, so a lost executor mid-run recovers
  *    from files instead of killing the job.
  *  - Dangling mass is deliberately dropped (ranks are relative
  *    scores, not a normalized distribution) — isolated nodes settle
  *    at exactly the teleport term.
  */
object PageRank {

  /** Rank micro-unit scale: r0 = one full unit. */
  val Unit0 = 1000000L

  /** Damping in basis-hundredths (85 = the canonical 0.85). */
  val DampPct = 85

  /** Fixed-iteration integer PageRank over `edges(id, nb)` (directed,
    * id → nb) for every node in `nodes(id)`. Returns
    * (id, rank_micro, deg) where deg is the OUT-degree used for the
    * contribution split (0 for sink nodes). */
  def ranks(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import graft.queries.FrameMemo.checkpointed
    val teleport = Unit0 * (100 - DampPct) / 100
    val e = checkpointed(edges.select(col("id"), col("nb")))
    val deg = checkpointed(
      e.groupBy(col("id")).agg(count(lit(1)).as("deg")))
    var r = nodes.select(col("id"), lit(Unit0).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, "id").join(deg, "id")
        .select(col("nb").as("id"),
          expr(s"(r * $DampPct) DIV (100 * deg)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
      r = checkpointed(nodes.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("c"), lit(0L))).as("r")))
    }
    r.join(deg, Seq("id"), "left")
      .select(col("id"), col("r").as("rank_micro"),
        coalesce(col("deg"), lit(0L)).as("deg"))
  }

  /** PERSONALIZED (seeded-teleport) PageRank — TrustRank (Gyöngyi,
    * Garcia-Molina & Pedersen, VLDB 2004): the teleport mass lands
    * ONLY on `seeds`, so ranks measure proximity to the trusted set —
    * the selection score for "more data like these curated examples"
    * (non-seed nodes unreachable from a seed settle at exactly 0).
    * Same exact-integer arithmetic, per-round plan shape, and
    * checkpoint discipline as [[ranks]]; the seed frame joins in as
    * one extra broadcast-size left join per round. */
  def personalizedRanks(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import graft.queries.FrameMemo.checkpointed
    val teleport = Unit0 * (100 - DampPct) / 100
    val e = checkpointed(edges.select(col("id"), col("nb")))
    val deg = checkpointed(
      e.groupBy(col("id")).agg(count(lit(1)).as("deg")))
    val s = checkpointed(
      seeds.select(col("id")).distinct().withColumn("_s", lit(1L)))
    def seedTerm(unit: Long) =
      when(col("_s").isNotNull, lit(unit)).otherwise(lit(0L))
    var r = nodes.join(s, Seq("id"), "left")
      .select(col("id"), seedTerm(Unit0).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, "id").join(deg, "id")
        .select(col("nb").as("id"),
          expr(s"(r * $DampPct) DIV (100 * deg)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("c"))
      r = checkpointed(nodes.select(col("id"))
        .join(s, Seq("id"), "left")
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (seedTerm(teleport) + coalesce(col("c"), lit(0L))).as("r")))
    }
    r.join(deg, Seq("id"), "left")
      .select(col("id"), col("r").as("rank_micro"),
        coalesce(col("deg"), lit(0L)).as("deg"))
  }
}
