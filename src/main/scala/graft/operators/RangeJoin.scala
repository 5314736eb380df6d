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
  *
  * Domain: point/start/end must be NON-NEGATIVE longs (integer DIV is
  * used for bucketing; truncation == floor only for >= 0).
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
    // integer DIV, not `/`: double division mis-buckets long values
    // above 2^53 (same pitfall as the nanos timestamps elsewhere in
    // this repo). DIV truncates toward zero == floor for the
    // non-negative domain this operator is documented for.
    def bucketOf(c: String) = expr(s"`$c` DIV $bucketWidth")
    val bucketed = points.withColumn("_bucket", bucketOf(pointCol))
    val exploded = intervals
      // empty/inverted intervals ([e <= s]) contain nothing; drop them
      // rather than letting a descending sequence fabricate buckets
      .where(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(bucketOf(startCol), expr(s"(`$endCol` - 1) DIV $bucketWidth"))))
    bucketed.join(exploded, Seq("_bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
