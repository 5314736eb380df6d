package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture rebalancing — deterministic downsampling of each
  * domain (source/language/bucket) to a per-domain token budget, the
  * pass that turns a crawl-skewed corpus into a training mix. No
  * reference implementation; driver-mandated pipeline operator.
  *
  * All sampling decisions are integer arithmetic on md5 basis points
  * (the [[DataSplit]] family): a row's fate depends only on
  * (seed, id, its domain's rate), so reprocessing, retries, and
  * late-arriving shards cannot reshuffle the kept set.
  *
  * Scale shape at 100 TB:
  *  - Pass 1 is ONE partial-aggregated groupBy over the corpus
  *    (per-domain token totals — |domains| rows, map-side combined).
  *  - Rates are computed on those |domains| rows and broadcast back;
  *    the keep/drop decision is then a per-row codegen'd expression —
  *    the sampling itself is a MAP-ONLY pass, no corpus shuffle.
  *  - Rates use BIGINT basis-point division exactly replayable in
  *    ANSI SQL, so the kept set is oracle-checkable bit-for-bit.
  */
object DomainMix {

  /** Per-domain sampling rate in basis points: keep
    * min(1, budget / domain_weight) of each domain, where the budget
    * is `totalWeight / (budgetDenom * n_domains)` — i.e. an equal
    * share of a 1/budgetDenom-sized target corpus. Returns
    * (domain, n_total, dom_weight, rate_bp). */
  def rates(df: DataFrame, domainCol: String, weightCol: Column,
      budgetDenom: Int): DataFrame = {
    val dom = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_total"),
        sum(weightCol).cast("long").as("dom_weight"))
    val tot = dom.agg(sum(col("dom_weight")).cast("long").as("all_weight"),
      count(lit(1)).as("n_domains"))
    // integer arithmetic throughout (DIV, not /: Spark's / is double):
    // budget = all DIV (denom*n), rate_bp = min(10000, 10000*budget DIV dom)
    dom.crossJoin(broadcast(tot))
      .withColumn("rate_bp",
        least(lit(10000L), expr(
          s"(10000L * (all_weight DIV (${budgetDenom}L * n_domains))) DIV dom_weight")))
      .select(col(domainCol), col("n_total"), col("dom_weight"), col("rate_bp"))
  }

  /** Rows of `df` kept under the domain rates: md5 basis point of
    * (seed, id) below the row's domain rate. The rates frame is tiny
    * (|domains| rows) and broadcast; the filter is map-only. */
  def sample(df: DataFrame, idCol: String, domainCol: String,
      weightCol: Column, budgetDenom: Int, seed: String): DataFrame = {
    val r = rates(df, domainCol, weightCol, budgetDenom)
    df.join(broadcast(r), Seq(domainCol))
      .where(DataSplit.bucketBp(col(idCol), seed) < col("rate_bp"))
  }

  /** TEMPERATURE-scaled rates (α = 0.5, the multilingual sampling
    * rule of XLM-R-class pipelines: sampling share ∝ w_d^α): each
    * domain's budget is its share of `all_weight DIV budgetDenom`
    * proportional to the integer floor-sqrt of its weight — hot
    * domains damped, tail domains boosted, relative order preserved.
    * `floor(sqrt(w))` on a BIGINT below 2⁵² is EXACT integer isqrt in
    * any IEEE engine (sqrt is correctly rounded; the nearest double
    * to √(k²−1) is strictly below k while k² is exact), so the rates
    * replay bit-for-bit in the oracle. Returns
    * (domain, n_total, dom_weight, sq, rate_bp). */
  def temperatureRates(df: DataFrame, domainCol: String, weightCol: Column,
      budgetDenom: Int): DataFrame = {
    val dom = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_total"),
        sum(weightCol).cast("long").as("dom_weight"))
      .withColumn("sq", floor(sqrt(col("dom_weight"))).cast("long"))
    val tot = dom.agg(sum(col("dom_weight")).cast("long").as("all_weight"),
      sum(col("sq")).cast("long").as("sq_sum"))
    // (budget * sq) DIV sq_sum spelled as the exact decomposition
    // (budget DIV sq_sum) * sq + ((budget % sq_sum) * sq) DIV sq_sum —
    // identical for non-negative operands, but the intermediates stay
    // below 2^63 at 100 TB magnitudes (the naive budget*sq product
    // overflows BIGINT at ~1e13 token weight × ~3e6 sq for small
    // denominators). Remaining bound: sq_sum * max(sq) < 2^63, i.e.
    // safe through ~10^6 domains of ~10^13 tokens each.
    dom.crossJoin(broadcast(tot))
      .withColumn("_budget", expr(s"all_weight DIV ${budgetDenom}L"))
      .withColumn("rate_bp",
        least(lit(10000L), expr(
          "(10000L * ((_budget DIV sq_sum) * sq + ((_budget % sq_sum) * sq) DIV sq_sum)) DIV dom_weight")))
      .select(col(domainCol), col("n_total"), col("dom_weight"), col("sq"),
        col("rate_bp"))
  }

  /** [[sample]] under [[temperatureRates]] — same broadcast + map-only
    * keep/drop shape, reprocessing-stable on (seed, id). */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
      weightCol: Column, budgetDenom: Int, seed: String): DataFrame = {
    val r = temperatureRates(df, domainCol, weightCol, budgetDenom)
    df.join(broadcast(r), Seq(domainCol))
      .where(DataSplit.bucketBp(col(idCol), seed) < col("rate_bp"))
  }
}
