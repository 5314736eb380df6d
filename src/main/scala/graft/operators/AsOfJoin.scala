package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the LATEST right row with
  * `rightTime <= leftTime` within the same key (the time-series
  * point-in-time lookup Spark has no built-in for; the builder brief
  * names it as a custom-operator case).
  *
  * Spark-first implementation: UNION the two sides, tag them, and take
  * a running `last(right_payload, ignoreNulls)` over
  * (key ORDER BY time, side) — right rows sort BEFORE left rows at
  * equal timestamps, so `<=` matches. ONE shuffle + sort on the key,
  * no inequality join, no BroadcastNestedLoopJoin: exactly the plan a
  * 100 TB time-series lookup needs (both sides stream through the same
  * sort; state per row is one payload struct).
  */
object AsOfJoin {

  /** Left rows joined to their as-of right payload.
    *
    * @param left      point-lookup side
    * @param right     reference side (must not share column names with
    *                  `left` except `key`)
    * @param key       equality key column present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @return all `left` columns plus `right`'s non-key columns
    *         prefixed `asof_` (NULL when no right row precedes) */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val rightPayload = right.columns.filter(_ != key).toSeq
    val reserved = Set("_t", "_side", "_rv", "_asof")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"asOf: column names ${reserved.mkString("/")} are reserved")
    val overlap = left.columns.toSet intersect rightPayload.toSet
    require(overlap.isEmpty,
      s"asOf: left and right must not share non-key columns, got $overlap")
    require(!left.columns.exists(c => rightPayload.contains(c.stripPrefix("asof_"))) &&
      !left.columns.exists(_.startsWith("asof_")),
      "asOf: left columns must not collide with asof_-prefixed outputs")
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    val r = right
      // a NULL rightTime can never satisfy rightTime <= leftTime; drop
      // such rows here or NULLS-FIRST ordering would make them the
      // running match for everything after them
      .where(col(rightTime).isNotNull)
      .select(col(key) +: rightPayload.map(col): _*)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_rv", struct(rightPayload.map(col): _*))
      .drop(rightPayload: _*)
    // align columns: left side carries all left columns; right side
    // carries nulls for them
    val leftCols = left.columns.toSeq
    val rPadded = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols :+ "_t" :+ "_side" :+ "_rv").map(col): _*)
    val lAligned = l.select((leftCols :+ "_t" :+ "_side" :+ "_rv").map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lAligned.unionByName(rPadded)
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"asof_$c", col("_asof").getField(c))
    }.drop("_t", "_side", "_rv", "_asof")
  }
}
