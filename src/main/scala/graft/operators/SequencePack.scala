package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the last step before a training
  * run: concatenate documents in a deterministic order and cut the
  * stream every `budget` tokens, so each bin becomes one (padded)
  * training sequence batch. Contiguous packing (first-fit in stream
  * order) is what production packers do; bin-optimal packing is
  * NP-hard and order-destroying.
  *
  * Scale shape: a single global running sum would serialize 100 TB
  * through one partition, so documents are first sharded by a
  * deterministic id hash (the same md5 basis-point family as
  * [[DataSplit]] — replayable in SQL, stable under reprocessing) and
  * packed WITHIN each shard: one exchange on the shard key, then a
  * per-shard window whose running sum is all integer arithmetic.
  * Shards are independent, so shard count scales with the cluster
  * and each training worker can own whole shards.
  *
  * Everything is BIGINT (token counts, cumulative sums, `DIV`), so
  * the assignment is bit-replayable: bin = startOffset DIV budget,
  * where startOffset is the running token count BEFORE the document.
  * A document larger than the budget still gets the bin its start
  * falls in (real packers split or truncate it downstream — that
  * policy stays out of the assignment).
  */
object SequencePack {

  /** Assign each row a `shard` and a `bin`: deterministic hash shard,
    * then contiguous token-budget packing within the shard in
    * ascending `idCol` order. Keeps input columns. `groupCols` adds
    * packing boundaries ABOVE the shard (e.g. the train/val/test
    * fold: a bin must never mix folds), each group packing its shards
    * independently from bin 0. */
  def assignBins(df: DataFrame, idCol: String, tokensCol: String,
      numShards: Int, budgetTokens: Long, seed: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy((groupCols :+ "shard").map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `_start` (the running token count BEFORE the document) is built
    // with Column arithmetic so `tokensCol` resolves through analysis
    // like every other column reference (a spliced SQL string would
    // break on names needing backtick quoting); only the generated
    // `_start` name and the numeric budget reach the DIV expr.
    df.withColumn("shard", DataSplit.bucketBp(col(idCol), seed) % numShards)
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("_start", col("_cum") - col(tokensCol))
      .withColumn("bin", expr(s"_start DIV $budgetTokens"))
      .drop("_cum", "_start")
  }
}
