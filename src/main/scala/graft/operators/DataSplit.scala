package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting — the assignment step every
  * training-data pipeline runs last. Requirements at 100 TB:
  *   - STABLE: an id's fold depends only on (seed, id), never on the
  *     corpus — reprocessing, late-arriving data, or a changed row
  *     count must not reshuffle existing assignments (so no
  *     `randomSplit`, whose outcome depends on partitioning).
  *   - LEAK-PROOF by key: splitting on a document/group id keeps all
  *     rows of one id in one fold.
  *   - ZERO shuffle: a per-row hash expression, fully codegen'd —
  *     the split of a 100 TB table is a map-only job.
  *
  * Assignment: basis points from the first 7 hex digits of
  * md5("<seed>:<id>") mod 10000 — the same replayable md5-slice
  * family the MinHash/rolling-hash oracles use (7 digits = 28 bits,
  * exact in BIGINT on both engines). */
object DataSplit {

  /** Basis-point bucket (0-9999) for an id column under a seed. */
  def bucketBp(idCol: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), idCol.cast("string"))), 1, 7),
      16, 10).cast("long") % 10000

  /** Fold label from cumulative basis-point upper bounds, e.g.
    * Seq(("train", 8000), ("val", 9000)) -> train is [0,8000), val is
    * [8000,9000), and everything else falls to `lastFold`. */
  def foldOf(idCol: Column, seed: String,
      bounds: Seq[(String, Int)], lastFold: String): Column = {
    require(bounds.nonEmpty && bounds.map(_._2) == bounds.map(_._2).sorted,
      "fold bounds must be ascending")
    val bp = bucketBp(idCol, seed)
    bounds.foldRight(lit(lastFold): Column) { case ((name, ub), rest) =>
      when(bp < ub, name).otherwise(rest)
    }
  }

  /** The standard 80/10/10 split, appended as a `fold` column. */
  def withFold(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("fold",
      foldOf(col(idCol), seed, Seq(("train", 8000), ("val", 9000)), "test"))

  /** k-fold cross-validation assignment: fold i in [0, k) from the
    * same md5-slice family (28 bits mod k — the ≤0.006% residue bias
    * at k ≤ 16 is far below any CV noise floor). Same contract as
    * [[withFold]]: stable under reprocessing, leak-proof per id,
    * map-only. Fold i's validation set is `fold = i`, training set
    * `fold <> i` — coverage and disjointness are structural (every id
    * computes exactly one fold). */
  def withKFold(df: DataFrame, idCol: String, seed: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 16, s"k must be in [2, 16], got $k")
    df.withColumn("fold",
      (conv(substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))),
        1, 7), 16, 10).cast("long") % k).cast("int"))
  }
}
