package graft.operators

import graft.functions.GraftFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index build, Spark-first (SURVEY §2.3
  * similarity; no reference implementation — driver-mandated scale
  * path).
  *
  * Two properties matter at 100 TB:
  *
  *  1. **Cell assignment is a per-row fold, not a join.** The naive
  *     plan (crossJoin corpus x centroids, then `row_number` over a
  *     window partitioned by vector id) shuffles k copies of the
  *     corpus through an exchange just to pick each row's argmax.
  *     Here the (tiny) centroid table is collapsed to ONE row holding
  *     a sorted array of (cid, cv, cnrm) structs, broadcast, and each
  *     corpus row folds over it with `aggregate` + the codegen'd
  *     `vec_dot` — zero shuffle, zero window, corpus scanned once.
  *     Ties take the LOWEST cid (the fold only replaces on strictly
  *     greater similarity and iterates in ascending cid order).
  *
  *  2. **Lloyd refinement with order-independent means.** K-means
  *     averages are float sums, whose value depends on partial-
  *     aggregation order — poison for a bit-exact oracle. Centroid
  *     means are therefore computed over coordinates quantized to
  *     `floor(x * 2^20)` (exact BIGINT sums in ANY aggregation order,
  *     magnitudes bounded by count * 2^21 << 2^63), divided back as
  *     one double division. The quantization error (<= 2^-20 per
  *     coordinate) is far below any meaningful centroid movement, and
  *     the whole iteration — assign, per-(cell, dim) partial-agg sum
  *     (map-side combined, shuffle carries cells x dims rows, not the
  *     corpus), re-centroid — is deterministic and replayable in SQL.
  *     Cells that lose all members simply drop out of the next round
  *     (standard Lloyd degeneracy handling; both engines agree because
  *     membership is identical).
  */
object IvfIndex {

  /** Quantization scale for order-independent centroid means. */
  val Scale: Double = 1048576.0 // 2^20

  private def dot(a: Column, b: Column): Column = GraftFunctions.vec_dot(a, b)

  /** Assign each corpus row (vec_id, v, nrm) to its max-cosine cell
    * from `cents` (cid, cv, cnrm) — per-row argmax fold over the
    * broadcast centroid array; adds `cid`, keeps the input columns. */
  def assignCells(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val centsRow = cents.agg(
      sort_array(collect_list(struct(col("cid"), col("cv"), col("cnrm"))))
        .as("cs"))
    corpus.crossJoin(broadcast(centsRow))
      .withColumn("_best",
        aggregate(col("cs"),
          struct(lit(-1L).as("cid"), lit(Double.NegativeInfinity).as("sim")),
          (acc, c) => {
            val sim = dot(col("v"), c.getField("cv")) /
              (col("nrm") * c.getField("cnrm"))
            when(sim > acc.getField("sim"),
              struct(c.getField("cid").as("cid"), sim.as("sim")))
              .otherwise(acc)
          }))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("_best").getField("cid").as("cid"))
  }

  /** One Lloyd update: new centroids = quantized per-cell coordinate
    * means of `assigned` (vec_id, v, nrm, cid). The per-(cid, dim)
    * sum partial-aggregates map-side, so the exchange carries
    * |cells| x dim rows per partition — never the vectors. */
  def lloydUpdate(assigned: DataFrame): DataFrame = {
    val sums = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(sum(floor(col("x") * Scale)).as("sv"), count(lit(1)).as("cnt"))
      .select(col("cid"), col("i"),
        (col("sv").cast("double") / (col("cnt").cast("double") * Scale)).as("m"))
    sums.groupBy(col("cid"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("cv"))
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
  }

  /** Refine seed centroids with `iterations` Lloyd rounds; returns the
    * final (cid, cv, cnrm) frame. Each round's (tiny) centroid frame
    * is checkpointed ([[graft.queries.FrameMemo.checkpointed]] —
    * honors `spark.graft.memo.reliable`) so iteration plans stay flat
    * instead of re-embedding the whole corpus lineage per round. */
  def refine(corpus: DataFrame, seeds: DataFrame, iterations: Int): DataFrame = {
    var cents = seeds
    for (_ <- 0 until iterations)
      cents = graft.queries.FrameMemo.checkpointed(
        lloydUpdate(assignCells(corpus, cents)))
    cents
  }

  /** Build the index: seed centroids -> `iterations` Lloyd rounds ->
    * final cell assignment of the corpus. */
  def build(corpus: DataFrame, seeds: DataFrame, iterations: Int): DataFrame =
    assignCells(corpus, refine(corpus, seeds, iterations))

  /** Incremental ADDITION to a persisted cell-keyed vector artifact —
    * [[deleteFromIndex]]'s mirror, completing the index lifecycle
    * (build -> serve -> add -> delete). `additions` must already
    * carry the index schema (assigned against the FIXED centroids and
    * encoded with the FIXED codebook — production adds never retrain
    * the quantizer, so an add followed by the oracle's from-scratch
    * assignment of the union corpus is bit-identical). Existing rows
    * pass through untouched; per-cell counts heal UPWARD from the
    * additions alone, full-outer so a previously-empty cell enters
    * the stats. (Both sides of the count join are cells-sized — tiny;
    * no broadcast hint: Spark ignores broadcast on FULL OUTER, so a
    * hint would just imply a plan that never materializes.)
    * Returns (new index rows, healed per-cell counts). */
  def addToIndex(index: DataFrame, counts: DataFrame,
      additions: DataFrame): (DataFrame, DataFrame) = {
    val cols = index.columns.toSeq.map(col)
    val addPerCell = additions.groupBy(col("cid"))
      .agg(count(lit(1)).as("__an"))
    val healed = counts.join(addPerCell, Seq("cid"), "full_outer")
      .select(col("cid"),
        (coalesce(col("n_vecs"), lit(0L)) +
          coalesce(col("__an"), lit(0L))).as("n_vecs"))
    (index.unionByName(additions.select(cols: _*)), healed)
  }

  /** Tombstone DELETION over a persisted cell-keyed vector artifact —
    * the GDPR verb of the ANN lifecycle (q290's BM25 discipline
    * applied to vector indexes; before this, a delete forced a full
    * index rebuild). Given ONLY the deleted ids:
    *
    *  1. the (tiny) set of cells that can contain a deleted vector is
    *     resolved by one equi-join touching only the deleted rows;
    *  2. every OTHER cell's rows pass through untouched (left_anti on
    *     the broadcast cell set — at 100 TB this is the difference
    *     between rewriting nprobe-sized cells and the corpus);
    *  3. affected cells drop exactly the tombstoned ids;
    *  4. per-cell counts SELF-HEAL from the delete alone: untouched
    *     cells keep their count, affected cells subtract the number
    *     of ids actually deleted there — no recount scan. Cells whose
    *     last vector dies drop out of the stats (the BM25
    *     empty-block convention).
    *
    * Centroids deliberately do NOT retrain: a production vector index
    * removes rows from cells without moving the quantizer, so a
    * delete followed by the oracle's from-scratch re-assignment of
    * the RETAINED corpus against the same centroids is bit-identical
    * (q295 states exactly that). Works on any frame carrying
    * (vec_id, cid, ...payload) — the IVF assignment and the IVF x PQ
    * code artifacts alike. When accumulated churn has decayed the
    * quantizer's fit, [[rebalance]] is the retrain remedy.
    *
    * Returns (new index rows, healed per-cell counts). */
  def deleteFromIndex(index: DataFrame, counts: DataFrame,
      tombstones: DataFrame): (DataFrame, DataFrame) = {
    val tb = tombstones.select(col("vec_id").cast("long").as("del_id"))
    // only the deleted rows are touched to find their cells
    val delPerCell = index.join(tb, col("vec_id") === col("del_id"))
      .groupBy(col("cid")).agg(count(lit(1)).as("__dn"))
    val delCells = broadcast(delPerCell.select(col("cid")))
    // a using-columns join moves the key first — restore the input
    // column order so the artifact schema is stable under deletion
    val cols = index.columns.toSeq.map(col)
    val untouched = index.join(delCells, Seq("cid"), "left_anti")
      .select(cols: _*)
    val rewritten = index.join(delCells, Seq("cid"), "left_semi")
      .join(tb, col("vec_id") === col("del_id"), "left_anti")
      .select(cols: _*)
    val healed = counts.join(broadcast(delPerCell), Seq("cid"), "left")
      .select(col("cid"),
        (col("n_vecs") - coalesce(col("__dn"), lit(0L))).as("n_vecs"))
      .where(col("n_vecs") > 0)
    (untouched.unionByName(rewritten), healed)
  }

  /** RETRAIN / REBALANCE — the verb that completes the lifecycle
    * (build -> serve -> add -> delete -> REBALANCE). [[addToIndex]] /
    * [[deleteFromIndex]] deliberately pin the quantizer, so under
    * heavy churn the centroids drift away from the corpus they
    * partition: cells bloat or starve and probe recall decays with no
    * remedy short of a rebuild. `rebalance` IS that rebuild, as a
    * first-class operation on the index itself:
    *
    *  1. the CURRENT corpus is exactly the index's own rows — no
    *     re-read of a source table (at 100 TB the index artifact is
    *     the only authority on what survived the churn);
    *  2. fresh seeds are the `k` lowest-id survivors (deterministic —
    *     the same rule the original build used, so the retrain chain
    *     replays in SQL);
    *  3. the seed set refines through the same quantized-Lloyd rounds
    *     as a fresh build ([[refine]]) and every row re-assigns
    *     ([[assignCells]] — one corpus pass, no shuffle);
    *  4. the caller swaps the result in ATOMICALLY via
    *     [[IndexStore.rebuild]]'s temp-dir + move, so probes serve
    *     the old artifact until the new one is complete.
    *
    * By construction the result is BIT-IDENTICAL to a fresh build of
    * the surviving corpus under the same parameters
    * (IvfRebalanceSpec pins the equality), which is exactly the
    * recall guarantee: post-rebalance probes perform as if the index
    * had never churned. Returns (retrained centroids, re-assigned
    * index rows). */
  def rebalance(index: DataFrame, k: Int,
      iterations: Int): (DataFrame, DataFrame) = {
    val corpus = index.select(col("vec_id"), col("v"), col("nrm"))
    val seeds = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val cents = refine(corpus, seeds, iterations)
    (cents, assignCells(corpus, cents))
  }
}
