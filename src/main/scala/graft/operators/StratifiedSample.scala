package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic per-stratum downsampling — the corpus-rebalancing
  * step of a training-data pipeline (cap the over-represented
  * languages/sources, keep the rest). Same requirements as
  * [[DataSplit]], and the same hash device:
  *   - STABLE: keep/drop depends only on (seed, id) — re-running the
  *     pipeline, or running it on a grown corpus, never flips a
  *     decision on an existing row (unlike `df.sampleBy`, whose
  *     outcome depends on partitioning and RNG draw order).
  *   - EXACT-ish rates per stratum: the id hash is uniform in basis
  *     points, so a 2500-bp rate keeps ~25% of each stratum.
  *   - ZERO shuffle: one filter expression over a map literal —
  *     sampling 100 TB is a map-only scan, and the predicate pushes
  *     past column pruning like any other filter.
  *
  * Composable with [[DataSplit]]: under DIFFERENT seeds the sample
  * and the fold assignment are independent hashes; under the SAME
  * seed the sample is exactly a rate-prefix of the fold order (keep
  * the seeds distinct unless that coupling is wanted).
  */
object StratifiedSample {

  /** Filter `df` to a per-stratum sample: keep a row iff its
    * (seed, id) basis points (0-9999) fall below the stratum's rate.
    * Strata absent from `ratesBp` use `defaultBp`. */
  def sampleBy(df: DataFrame, idCol: String, stratumCol: String,
      ratesBp: Map[String, Int], defaultBp: Int, seed: String): DataFrame = {
    require((ratesBp.values ++ Seq(defaultBp)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    df.where(DataSplit.bucketBp(col(idCol), seed) < rateOf(
      col(stratumCol), ratesBp, defaultBp))
  }

  private def rateOf(stratum: Column, ratesBp: Map[String, Int],
      defaultBp: Int): Column =
    if (ratesBp.isEmpty) lit(defaultBp)
    else coalesce(element_at(typedlit(ratesBp), stratum), lit(defaultBp))
}
