package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The cached-min-distance mode must select the identical trajectory
  * as the rejoin mode (same exact integer argmax + tie-break), while
  * folding only the newest center per round. */
class KCenterSpec extends SparkTestBase {

  import spark.implicits._

  private def trajectory(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("round").collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq

  test("cached mode equals the rejoin mode on fixture embeddings (k = 8)") {
    val e = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .where(col("mx") > 0)
      .select(col("vec_id"),
        transform(col("v"), x => floor(x * 127.0 / col("mx")).cast("long"))
          .as("vq"))
    val rejoin = trajectory(KCenter.select(e, "vec_id", 8))
    val cached = trajectory(KCenter.select(e, "vec_id", 8, cachedMinDist = true))
    assert(rejoin.length == 8)
    assert(cached == rejoin, s"\ncached: $cached\nrejoin: $rejoin")
  }

  test("cached mode equals rejoin at larger k on a synthetic grid, incl. the covered stop") {
    // 40 distinct 2-d points: both modes must agree deep into the
    // selection, and both must stop (no duplicates) once k exceeds
    // the number of distinct points
    val pts = (0 until 40).map(i =>
      (i.toLong, Array((i % 8).toLong * 10, (i / 8).toLong * 10)))
      .toDF("vec_id", "vq")
    val rejoin = trajectory(KCenter.select(pts, "vec_id", 16))
    val cached = trajectory(KCenter.select(pts, "vec_id", 16, cachedMinDist = true))
    assert(cached == rejoin)
    val r50 = trajectory(KCenter.select(pts, "vec_id", 50, cachedMinDist = true))
    assert(r50 == trajectory(KCenter.select(pts, "vec_id", 50)))
    assert(r50.length <= 40 && r50.map(_._2).distinct.length == r50.length)
  }
}
