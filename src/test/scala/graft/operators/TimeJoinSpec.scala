package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class TimeJoinSpec extends SparkTestBase {

  test("asOf picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val quotes = Seq( // (user, time, px)
      (1L, 10L, "q10"), (1L, 20L, "q20"), (1L, 30L, "q30"),
      (2L, 15L, "q15")).toDF("k", "qt", "px")
    val trades = Seq(
      (1L, 5L, "t5"),    // before any quote -> null
      (1L, 20L, "t20"),  // equal timestamp -> matches q20
      (1L, 25L, "t25"),  // between -> q20
      (1L, 99L, "t99"),  // after all -> q30
      (2L, 14L, "t14"),  // before -> null
      (3L, 50L, "t50")   // key with no quotes -> null
    ).toDF("k", "tt", "tid")
    val out = AsOfJoin.asOf(trades, quotes, "k", "tt", "qt")
      .select(col("tid"), col("asof_px")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "t5" -> None, "t20" -> Some("q20"), "t25" -> Some("q20"),
      "t99" -> Some("q30"), "t14" -> None, "t50" -> None))
  }

  test("asOf plan is one sort-exchange on the key, no join operator at all") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "lt", "lv")
    val r = Seq((1L, 5L, "b")).toDF("k", "rt", "rv")
    val plan = AsOfJoin.asOf(l, r, "k", "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("range join finds exactly the contained points and never nest-loops") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 25L), (5L, 99L))
      .toDF("pid", "t")
    val intervals = Seq(("w1", 0L, 11L), ("w2", 10L, 20L), ("w3", 90L, 95L))
      .toDF("iid", "s", "e")
    val joined = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      bucketWidth = 7L)
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // w1=[0,11): pids 1,2; w2=[10,20): 2,3; w3=[90,95): none (99 outside)
    assert(got == Set((1L, "w1"), (2L, "w1"), (2L, "w2"), (3L, "w2")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
