package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The q222/q235 cap contract: bounded pair fan-out above the cap,
  * the exact estimator untouched below it. */
class TheilSenSpec extends SparkTestBase {

  private def series(n: Int, user: Long = 7L) = {
    import spark.implicits._
    // deterministic synthetic spend series: strictly increasing t,
    // value wobbles around a +3c/step trend
    (0 until n).map(i =>
      (user, 1000000L + i * 60000000L, 500L + 3L * i + (i % 5) * 7L))
      .toDF("user_id", "t", "c")
  }

  test("a 10k-event user pairs at most k·(k−1)/2 rows, not ~5·10⁷") {
    val e = series(10000)
    val capped = TheilSen.cappedSeries(e, 64)
    assert(capped.count() == 64L)
    val out = TheilSen.trend(e, 64).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 10000L)
    assert(r.getAs[Long]("n_used") == 64L)
    assert(r.getAs[Long]("n_pairs") == 64L * 63 / 2,
      s"expected the full 2016 pairs of the capped series, got $r")
  }

  test("below the cap the estimator is the exact all-pairs Theil–Sen") {
    val e = series(20)
    val capped = TheilSen.trend(e, 64).collect().head
    assert(capped.getAs[Long]("n_pairs") == 20L * 19 / 2)
    // exact replay: median of all pairwise slopes, disc-lower
    val rows = series(20).collect().map(r => (r.getLong(1), r.getLong(2)))
    val slopes = (for {
      (a, i) <- rows.zipWithIndex; b <- rows.drop(i + 1)
    } yield {
      val (dt, dc) = (b._1 - a._1, b._2 - a._2)
      if (dc >= 0) 1000000L * dc / dt else -(1000000L * -dc / dt)
    }).sorted
    val expected = slopes((slopes.length + 1) / 2 - 1)
    assert(capped.getAs[Long]("trend_micro") == expected)
  }

  test("the capped subsample is deterministic across repartitionings") {
    val e = series(500)
    val k1 = TheilSen.cappedSeries(e.repartition(1), 16)
      .select("t", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val k7 = TheilSen.cappedSeries(e.repartition(7), 16)
      .select("t", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k1.size == 16 && k1 == k7)
  }

  test("the pair join stays a user-keyed equi-join (no cartesian)") {
    val plan = TheilSen.trend(series(100), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
