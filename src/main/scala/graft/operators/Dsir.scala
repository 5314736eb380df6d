package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
  * distribution looks like a TARGET corpus, by (1) fitting two
  * bag-of-hashed-ngram models — target and raw — over a fixed bucket
  * space, (2) scoring every raw document with its log importance
  * weight log p_target(x) − log p_raw(x), and (3) sampling without
  * replacement ∝ weight via the Gumbel-top-k trick. No reference
  * implementation; driver-mandated pipeline operator.
  *
  * Scale shape at 100 TB:
  *  - Model fit is ONE pass over each corpus ending in a
  *    `numBuckets`-row aggregate (hash bucket → count) with map-side
  *    combine; the bucket table is thousands of rows regardless of
  *    corpus size.
  *  - Scoring joins exploded tokens against the bucket-weight table
  *    BROADCAST (a few KB), then partial-aggregates per doc — tokens
  *    of a doc stay in their partition, so the per-doc sum collapses
  *    map-side and the only exchange carries one row per document.
  *  - Selection is a bounded top-k (the existing `max_k` shape via
  *    ORDER BY + LIMIT under AQE; partial top-k below the exchange).
  *
  * Determinism / oracle-replay: all counts are BIGINT; per-bucket log
  * weights are quantized ONCE to integer micro-nats with an explicit
  * half-up `floor(x·1e6 + 0.5)` (NOT engine `round`, whose
  * negative-value tie behavior differs between Java and DuckDB — the
  * weights here are signed, unlike [[NgramLm]]'s non-negative costs);
  * doc scores are then exact BIGINT sums in any aggregation order.
  * The Gumbel key u is a deterministic md5 uniform keyed on
  * (seed, doc_id) — reprocessing-stable, like every sampling operator
  * in this repo ([[DomainMix]], [[StratifiedSample]]).
  */
object Dsir {

  /** Micro-nat quantization scale (shared convention with
    * [[NgramLm.CostScale]]). */
  val Scale = 1000000L

  /** Hash-bucket count for the n-gram feature space. The DSIR paper
    * uses 10^4 buckets for unigram+bigram features; the bucket table
    * must stay broadcast-tiny, which holds through ~10^6. */
  val DefaultBuckets = 1024

  private def md5Long(c: Column, hexLen: Int): Column =
    conv(substring(md5(c), 1, hexLen), 16, 10).cast("long")

  /** Feature bucket of one token: first 7 md5 hex digits (28 bits) of
    * "dsir:token", mod `numBuckets`. */
  def bucket(token: Column, numBuckets: Int): Column =
    md5Long(concat(lit("dsir:"), token), 7) % numBuckets

  /** Per-bucket token counts of a corpus: (bucket, cnt) — one scan,
    * map-side-combined into a `numBuckets`-row frame. `toks` is the
    * tokenized corpus with an array column `tokCol`. */
  def bucketCounts(toks: DataFrame, tokCol: String, numBuckets: Int): DataFrame =
    toks.select(explode(col(tokCol)).as("_w"))
      .select(bucket(col("_w"), numBuckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Per-bucket importance weights in integer micro-nats:
    * w_micro(b) = ⌊ln( (cnt_t+1)(tot_r+B) / ((cnt_r+1)(tot_t+B)) )·1e6 + 0.5⌋
    * — add-one-smoothed log p_target(b) − log p_raw(b). Buckets are
    * the RAW corpus's occupied buckets (target ⊆ raw by construction
    * of selection; a bucket seen only in target contributes nothing
    * to any raw doc's score). Returns (bucket, w_micro), ≤ B rows. */
  def bucketWeights(raw: DataFrame, target: DataFrame, tokCol: String,
      numBuckets: Int = DefaultBuckets): DataFrame = {
    val r = bucketCounts(raw, tokCol, numBuckets)
    val t = bucketCounts(target, tokCol, numBuckets)
      .withColumnRenamed("cnt", "cnt_t")
    val totR = r.agg(sum(col("cnt")).as("tot_r"))
    val totT = t.agg(sum(col("cnt_t")).as("tot_t"))
    r.join(t, Seq("bucket"), "left")
      .na.fill(0L, Seq("cnt_t"))
      .crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("bucket"),
        floor(log(
          ((col("cnt_t") + 1) * (col("tot_r") + numBuckets)).cast("double") /
            ((col("cnt") + 1) * (col("tot_t") + numBuckets)).cast("double"))
          * Scale + 0.5).cast("long").as("w_micro"))
  }

  /** Per-document log importance score in micro-nats: the exact
    * BIGINT sum of w_micro over the doc's token buckets. Keeps
    * `keep` columns; docs whose token array is empty score 0.
    * The weight table is broadcast — the join never shuffles the
    * corpus. */
  def score(docs: DataFrame, idCol: String, tokCol: String,
      weights: DataFrame, keep: Seq[String] = Nil,
      numBuckets: Int = DefaultBuckets): DataFrame = {
    val keepCols = (idCol +: keep).map(col)
    docs.select(keepCols :+ explode_outer(col(tokCol)).as("_w"): _*)
      .select(keepCols :+ bucket(col("_w"), numBuckets).as("bucket"): _*)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(keepCols: _*)
      .agg(coalesce(sum(col("w_micro")), lit(0L)).as("score_micro"))
  }

  /** Deterministic Gumbel perturbation in micro-nats, keyed on
    * (seed, id): u = (h+1)/(2^28+1) with h the first 7 md5 hex digits
    * — u ∈ (0,1) strictly, so −ln(−ln u) is finite — then
    * g_micro = ⌊−ln(−ln u)·1e6 + 0.5⌋. */
  def gumbelMicro(id: Column, seed: String): Column = {
    val u = (md5Long(concat(lit(seed + ":"), id.cast("string")), 7) + 1)
      .cast("double") / (268435456.0 + 1.0)
    floor(-log(-log(u)) * Scale + 0.5).cast("long")
  }

  /** Gumbel-top-k selection: key = score_micro + g_micro, take the
    * `k` largest (ties to the lowest id). Equivalent to sampling k
    * docs without replacement with probability ∝ exp(score) — the
    * DSIR resampling step — but deterministic and reprocessing-stable
    * under the md5 uniform. */
  def select(scored: DataFrame, idCol: String, k: Int, seed: String): DataFrame =
    scored
      .withColumn("key_micro", col("score_micro") + gumbelMicro(col(idCol), seed))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
}
