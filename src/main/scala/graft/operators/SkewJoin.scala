package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §2.2 joins / builder brief
  * "salting for skew").
  *
  * AQE's skew-join handling rebalances SORT-MERGE join partitions at
  * runtime, but it cannot help when one logical key is itself hot (a
  * single key's rows exceed one task) AND the join is shuffled hash,
  * or when deterministic pre-planned balance is required. Classic
  * remedy, expressed Spark-first:
  *
  *  - LEFT (large, skewed) side: add `salt = pmod(hash(cols...), n)`
  *    derived from stable row content — each hot key's rows spread
  *    over n subkeys;
  *  - RIGHT (smaller) side: explode each row into all n salt values;
  *  - join on (key, salt): the hot key now occupies n shuffle
  *    partitions instead of one.
  *
  * Replication factor n multiplies the right side's shuffle volume, so
  * pick n ~ (hot-key rows / rows-per-task); at 100 TB the right side
  * is usually the dimension table, making n-fold replication cheap
  * (and if the right side is broadcast-small, broadcast instead — no
  * salt needed at all).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `n` ways.
    * Column sets must be disjoint apart from `key`. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int, saltBy: Seq[String]): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    require(!(left.columns ++ right.columns).contains("_salt"),
      "saltedInnerJoin reserves the column name _salt; rename it on the input")
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(saltBy.map(col): _*), lit(n)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Per-key salt fan-outs DERIVED FROM THE DATA: the key histogram of
    * `left` (the q73 diagnostic as an operator input), one fan-out per
    * key = ceil(rows / targetRowsPerSalt) clamped to [1, maxFanout].
    * Cold keys get fan-out 1 — no replication cost where there is no
    * skew; only genuinely hot keys pay (and bound) their spread. */
  def fanouts(left: DataFrame, key: String, targetRowsPerSalt: Long,
      maxFanout: Int): DataFrame = {
    require(targetRowsPerSalt > 0, "targetRowsPerSalt must be positive")
    require(maxFanout > 0, "maxFanout must be positive")
    left.groupBy(col(key))
      .agg(count(lit(1)).as("_keyrows"))
      .select(col(key),
        least(greatest(
            ceil(col("_keyrows").cast("double") / targetRowsPerSalt), lit(1L)),
          lit(maxFanout.toLong)).cast("int").as("_fan"))
  }

  /** Auto-tuned salted inner join: like [[saltedInnerJoin]], but the
    * fan-out is PER KEY, sized from the left side's key histogram
    * instead of a global constant — a cold key joins 1:1 while a hot
    * key spreads over ceil(rows/targetRowsPerSalt) subkeys. The
    * histogram is one map-side-combined aggregate over the left keys
    * (the diagnostic pass q73 already runs), broadcast onto both
    * sides; keys appearing only in `right` are dropped by the fan
    * join, which matches inner-join semantics exactly. */
  def autoSaltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      targetRowsPerSalt: Long, maxFanout: Int, saltBy: Seq[String],
      forceShuffle: Boolean = false): DataFrame = {
    val reserved = Seq("_salt", "_fan")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      "autoSaltedInnerJoin reserves the column names _salt/_fan; rename them on the input")
    val fan = broadcast(fanouts(left, key, targetRowsPerSalt, maxFanout))
    val saltedLeft = left.join(fan, key)
      .withColumn("_salt", pmod(hash(saltBy.map(col): _*), col("_fan")))
      .drop("_fan")
    val saltedRight = right.join(fan, key)
      .withColumn("_salt", explode(sequence(lit(0), col("_fan") - 1)))
      .drop("_fan")
    // forceShuffle pins the final join to sort-merge (MERGE hints on
    // both inputs, which AQE respects): the configuration under which
    // salting COMPOSES with spark.sql.adaptive.skewJoin — salting
    // pre-spreads each hot key across its fan-out so the shuffled
    // partitions AQE inspects are already balanced, and AQE's skew
    // splitter handles any residual partition-level imbalance (e.g.
    // many distinct warm keys hashing together). Prefer plain AQE
    // skew-join alone when no single key exceeds a task; prefer
    // salting (this operator) when one logical key is itself hot —
    // AQE can only split a partition down to ONE key's rows, never
    // below. Without forceShuffle a broadcast-small right side makes
    // the question moot (no shuffle, no skew, salt not needed).
    val (l, r) =
      if (forceShuffle) (saltedLeft.hint("merge"), saltedRight.hint("merge"))
      else (saltedLeft, saltedRight)
    l.join(r, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
