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
}
