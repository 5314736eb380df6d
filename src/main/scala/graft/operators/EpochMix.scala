package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Fractional epochs-per-domain replication — the "data recipe" pass
  * that materializes a training mixture where each domain is seen a
  * NON-INTEGER number of epochs (e.g. downweight the dominant crawl
  * to 0.3 epochs, upweight a scarce high-quality source to 2.5).
  * Published LLM data recipes state mixtures exactly this way; this
  * operator unifies upsampling and downsampling in one rule.
  *
  * A domain's epoch count in basis points `e` yields per document:
  * `copies = e div 10000 + (1 if bucket(seed, id) < e mod 10000)` —
  * the whole-epoch part replicates every document, the fractional
  * part keeps a deterministic hash slice ([[DataSplit.bucketBp]], the
  * md5 family), so e = 3000 is a plain 30% downsample and e = 25000
  * emits 2 copies of everything plus a third for half the ids.
  * A document's multiplicity depends only on (seed, id, its domain's
  * rate): stable under reprocessing, growth, and partitioning.
  *
  * Scale shape at 100 TB: a per-row codegen'd expression + an
  * `explode(sequence(1, copies))` — MAP-ONLY, zero exchanges; output
  * volume is exactly the recipe's token budget. The epoch index is
  * kept as a column so downstream shuffling/packing can interleave
  * copies instead of clustering them.
  */
object EpochMix {

  /** Replicate `df` per `epochsBp` (domain value → epochs in basis
    * points; `defaultBp` for unlisted domains). Rows with zero copies
    * disappear; emitted rows carry a 1-based `epoch` index. */
  def replicate(df: DataFrame, idCol: String, domainCol: String,
      epochsBp: Map[String, Int], defaultBp: Int, seed: String): DataFrame = {
    require((defaultBp +: epochsBp.values.toSeq).forall(_ >= 0),
      "epoch basis points must be >= 0")
    val eBp = epochsBp.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBp)) { case ((d, e), rest) =>
        when(col(domainCol) === d, lit(e)).otherwise(rest)
      }
    // integer div/mod via exact small-int double floor (the Column
    // API's / is double division; operands are < 2^20)
    val whole = floor(eBp / lit(10000.0)).cast("int")
    val frac = pmod(eBp, lit(10000))
    val copies = (whole
      + when(DataSplit.bucketBp(col(idCol), seed) < frac, 1).otherwise(0))
      .as("n_copies")
    df.withColumn("n_copies", copies)
      .where(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("n_copies"))))
      .drop("n_copies")
  }
}
