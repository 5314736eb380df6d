package graft.operators

import graft.functions.GraftFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication, SemDeDup-style (Abbas et
  * al., 2023, arXiv:2303.09540): cluster the corpus embeddings with
  * k-means, then find near-duplicate pairs ONLY within each cluster —
  * cosine above a threshold — and drop the higher id of every pair.
  * No reference implementation; driver-mandated pipeline operator.
  *
  * Why cluster-scoped at 100 TB: all-pairs cosine is O(n^2) and dead
  * on arrival; LSH (q48) needs near-exact duplicates to collide.
  * Semantic dedup targets the middle ground — paraphrases and
  * re-encodings with cosine ~0.9 — and the k-means partition bounds
  * the pair join at sum-of-cell-size^2. Sizing k so cells hold ~10^4
  * vectors makes every cell's pairwise block a single in-memory task;
  * the join below is an equi-join on `cid`, so Spark shuffles the
  * corpus exactly once (both sides of the self-join share the
  * exchange) and never goes cartesian.
  *
  * The cell assignment is NOT recomputed here — it is the persisted
  * IVF index artifact ([[IvfIndex]] via [[IndexStore]]), the same
  * clustering the ANN path probes. One clustering, two consumers:
  * exactly how a production pipeline amortizes the k-means cost.
  */
object SemanticDedup {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftFunctions.vec_dot(a, b)

  /** Near-duplicate pairs within cells: (ia, ib, cid, sim) with
    * ia < ib and cosine > `tau`. `assigned` needs (vec_id, v, nrm,
    * cid) — [[IvfIndex.assignCells]]' output shape. A `maxCellSize`
    * guard (degenerate-clustering protection, mirroring the near-dup
    * band-bucket cap) drops cells too large to pair safely — a capped
    * cell is reported un-deduped rather than exploding the join. */
  def pairs(assigned: DataFrame, tau: Double,
      maxCellSize: Int = Int.MaxValue): DataFrame = {
    val base =
      if (maxCellSize == Int.MaxValue) assigned
      else {
        val sizes = assigned.groupBy(col("cid"))
          .agg(count(lit(1)).as("cell_n"))
          .where(col("cell_n") <= maxCellSize)
          .select(col("cid"))
        assigned.join(broadcast(sizes), Seq("cid"), "left_semi")
      }
    val a = base.select(col("cid"), col("vec_id").as("ia"),
      col("v").as("va"), col("nrm").as("na"))
    val b = base.select(col("cid"), col("vec_id").as("ib"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, a("cid") === b("cid") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"), a("cid").as("cid"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .where(col("sim") > tau)
  }

  /** Ids dropped by the keep-lowest rule: every vec_id appearing as
    * the HIGHER member of a near-duplicate pair. */
  def dropIds(assigned: DataFrame, tau: Double,
      maxCellSize: Int = Int.MaxValue): DataFrame =
    pairs(assigned, tau, maxCellSize)
      .select(col("ib").as("vec_id")).distinct()

  /** The deduplicated corpus: `assigned` minus dropped ids. The
    * anti-join side is the (small) dropped-id set, broadcast. */
  def dedup(assigned: DataFrame, tau: Double,
      maxCellSize: Int = Int.MaxValue): DataFrame =
    assigned.join(broadcast(dropIds(assigned, tau, maxCellSize)),
      Seq("vec_id"), "left_anti")
}
