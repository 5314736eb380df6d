package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT a shared equality key — the
  * second join shape Spark's optimizer turns into a
  * BroadcastNestedLoopJoin (all-pairs) if written naively.
  *
  * Scale-correct decomposition: pick a bucket width, EXPLODE each
  * interval to the buckets it covers, bucket each point, equi-join on
  * the bucket id, then apply the exact containment filter. The join
  * becomes a hash join on bucket id whose fan-out is
  * interval_len/bucket_width rows per interval — linear, shuffled on a
  * well-distributed key, never quadratic.
  */
object RangeJoin {

  /** Join `points` to every interval containing them.
    *
    * @param points        frame with a long point column
    * @param intervals     frame with long start/end columns (inclusive
    *                      start, exclusive end); column names must not
    *                      collide with `points`
    * @param pointCol      point column name
    * @param startCol      interval start column name
    * @param endCol        interval end column name
    * @param bucketWidth   decomposition granularity — choose near the
    *                      typical interval length so each interval
    *                      explodes to O(1) buckets */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucketed = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val exploded = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    bucketed.join(exploded, Seq("_bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
