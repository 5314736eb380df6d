package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Batch event-analytics pins beyond the oracle gates. */
class EventQueriesSpec extends SparkTestBase {

  test("q153: unioning bucket sketches loses nothing vs sketching the day directly") {
    // HLL union at the same lgK is exact over the underlying
    // registers: estimate(union of 6h sketches) must equal
    // estimate(one sketch built over the whole day) — this is the
    // property that makes the rollup trustworthy, beyond the ±5%
    // accuracy pin in the gate.
    val ev0 = graft.sources.Tables.load(spark, sf0001, "events")
    val ev = ev0
      .select(col("user_id"), graft.sources.Tables.tsMicros(ev0).as("t"))
      .select(col("user_id"), expr(s"t DIV ${6L * 3600 * 1000 * 1000}").as("b6"))
      .withColumn("day", expr("b6 DIV 4"))
    val merged = ev.groupBy(col("day"), col("b6"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.nonEmpty && m == d,
      s"union-rollup estimates diverge from direct: ${m.toSeq.diff(d.toSeq)}")
  }

  test("q153: only sketch blobs cross the day-level exchange") {
    val plan = graft.SparkEntry.queries("q153_hll_rollup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // both aggregation levels partial-aggregate (map-side combine of
    // sketches/buckets) — the raw events never reach the day exchange
    assert("partial_".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q201: spine covers exactly the observed span; gaps = span - observed") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q201_gap_fill")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = graft.sources.Tables.load(spark, sf0001, "events")
    val obs = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), graft.sources.Tables.tsMicros(ev).as("t"))
      .select(col("user_id"), expr("t DIV 3600000000").as("b"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(min(col("b")).as("mn"), max(col("b")).as("mx"),
        count(lit(1)).as("n_obs"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(obs.nonEmpty && obs.length == got.size)
    obs.foreach { case (u, (mn, mx, nObs)) =>
      val (nBuckets, nGaps) = got(u)
      assert(nBuckets == mx - mn + 1, s"user $u span mismatch")
      assert(nGaps == nBuckets - nObs, s"user $u gap count mismatch")
    }
  }

  test("q201: no cartesian; the fill is user-keyed") {
    val plan = graft.SparkEntry.queries("q201_gap_fill")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q222: exact slope on a linear series; one outlier cannot move the median") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("theilsen").toString
    // user 1: perfectly linear, +5 cents per 1000 us => slope 5000 micro
    // user 2: same line plus ONE wild spike — Theil–Sen must hold 5000
    val lin = (0 to 5).map(i => (i.toLong, 1000L + i * 1000L, 1L, "purchase", (1.00 + 0.05 * i)))
    val spiky = (0 to 5).map(i => (10 + i.toLong, 1000L + i * 1000L, 2L,
      "purchase", if (i == 3) 900.0 else 1.00 + 0.05 * i))
    (lin ++ spiky).toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q222_theilsen_trend")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("trend_micro"))).toMap
    assert(got(1L) == ((15L, 5000L)), got.toString)
    // 5 of 15 pairs touch the spike; the median pair is still clean
    assert(got(2L)._1 == 15L && got(2L)._2 == 5000L, got.toString)
  }

  test("q223: week-0 cell equals cohort size; offsets non-negative; no cartesian") {
    val df = graft.SparkEntry.queries("q223_cohort_retention")(spark, sf0001)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative week offset")
    // every user is active in their own first week, so the k=0 cell is
    // the cohort's size and every later cell is bounded by it
    val week0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cw, k, n) =>
      assert(week0.contains(cw), s"cohort $cw missing its k=0 cell")
      assert(n <= week0(cw), s"cohort $cw offset $k: $n > ${week0(cw)}")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q224: hand-built level shift is found at the exact boundary") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chgpt").toString
    val day = 24L * 3600 * 1000 * 1000
    // 6 days at 100 cents/day, then 6 days at 900 cents/day: the
    // max-|mean-diff| split is exactly after day index 5 (d = 5)
    val evs = (0 until 12).map { i =>
      (i.toLong, i * day + 1000L, 1L, "purchase", if (i < 6) 1.00 else 9.00)
    }
    evs.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val top = graft.SparkEntry.queries("q224_changepoint")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.head._1 == 5L, top.mkString(", "))
    // means on the winning split are the two exact levels (x100 scale)
    assert(top.head._3 == 10000L && top.head._4 == 90000L, top.head.toString)
    // scores are emitted in non-increasing order
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
  }

  test("q229: hand-valued integral, tie width zero, single-event NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("twap").toString
    // user 1: 100c for 10us then 300c for 30us -> (1000+9000)/40 = 250
    // user 2: a same-timestamp tie (t=0: 100c then 500c by c-order; the
    //         100c row has zero width) then 500c for 10us -> 500
    // user 3: one event -> NULL twap, span 0
    val evs = Seq(
      (1L, 0L, 1L, "purchase", 1.00), (2L, 10L, 1L, "purchase", 3.00),
      (3L, 40L, 1L, "purchase", 9.99),
      (4L, 0L, 2L, "purchase", 1.00), (5L, 0L, 2L, "purchase", 5.00),
      (6L, 10L, 2L, "purchase", 7.77),
      (7L, 5L, 3L, "purchase", 2.00))
    evs.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q229_twap")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((3L, 250L, 40L)), got.toString)
    assert(got(2L) == ((3L, 500L, 10L)), got.toString)
    assert(got(3L) == ((1L, -1L, 0L)), got.toString)
  }

  test("q288 two-phase prefix sum == naive sweep; no unpartitioned window") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q288_peak_concurrency")(spark, sf)
    // every Window in the plan is partitioned — the whole point of the
    // two-phase form (the naive sweep's global window moves the corpus
    // to one task)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    df.queryExecution.optimizedPlan.collect { case w: LW => w }
      .foreach(w => assert(w.partitionSpec.nonEmpty,
        "unpartitioned window in the q288 plan"))
    // naive replay: sort all boundaries per type, run the sweep
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val iv = ev.select(org.apache.spark.sql.functions.col("event_type"),
        graft.sources.Tables.tsMicros(ev).as("t"),
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100) AS BIGINT) % 3600").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(1) + (r.getLong(2) + 60L) * 1000000L))
    val expect = iv.groupBy(_._1).map { case (et, xs) =>
      val bounds = xs.flatMap(x => Seq((x._2, 1L), (x._3, -1L)))
        .sortBy(identity)
      var run = 0L; var mx = Long.MinValue
      bounds.foreach { case (_, d) => run += d; mx = math.max(mx, run) }
      (et, xs.length.toLong, mx)
    }.toSeq.sortBy(_._1)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // sanity: at least one type genuinely overlaps
    assert(got.exists(_._3 > 1L))
  }
}
