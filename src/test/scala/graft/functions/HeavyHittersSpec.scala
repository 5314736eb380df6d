package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {

  private def estimates(df: org.apache.spark.sql.DataFrame,
      capacity: Int): Map[String, Long] = {
    GraftFunctions.register(spark)
    val row = df.agg(GraftFunctions.heavy_hitters(col("v"), capacity).as("mg"))
      .collect()(0)
    if (row.isNullAt(0)) Map.empty
    else row.getMap[String, Long](0).toMap
  }

  test("exact when the domain fits the capacity") {
    import spark.implicits._
    val data = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(7)("c")
    val est = estimates(data.toDF("v").repartition(8), capacity = 8)
    assert(est == Map("a" -> 100L, "b" -> 60L, "c" -> 7L),
      s"no eviction can occur below capacity: $est")
  }

  test("MG guarantee holds under eviction across many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // zipfish stream over 40 distinct items, capacity 8 -> evictions
    val data = Seq.fill(20000)(s"t${math.min(39, math.abs(rnd.nextGaussian() * 8).toInt)}")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val capacity = 8
    val est = estimates(data.toDF("v").repartition(16), capacity)
    assert(est.size <= capacity, s"state must stay bounded: ${est.size}")
    truth.foreach { case (item, f) =>
      val m = est.getOrElse(item, 0L)
      assert(m <= f, s"$item overestimated: $m > $f")
      assert((f - m) * (capacity + 1) <= n,
        s"$item undercount ${f - m} breaks the n/(capacity+1) bound")
    }
    // the clear heavy hitter must be tracked
    val top = truth.maxBy(_._2)._1
    assert(est.contains(top), s"heaviest item $top missing from $est")
  }

  test("null inputs are skipped and empty input yields null") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("v")
    val est = estimates(withNulls, capacity = 4)
    assert(est == Map("x" -> 2L))
    val empty = spark.emptyDataset[String].toDF("v")
    val row = empty.agg(GraftFunctions.heavy_hitters(col("v"), 4)).collect()(0)
    assert(row.isNullAt(0), "empty group must evaluate to NULL")
  }

  test("runs as streaming state: complete-mode aggregate over micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    GraftFunctions.register(spark)
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("v")
      .agg(GraftFunctions.heavy_hitters(col("v"), 4).as("mg"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    mem.addData(Seq.fill(30)("x") ++ Seq.fill(5)("y"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(20)("x") ++ Seq.fill(9)("z"): _*)
    q.processAllAvailable(); q.stop()
    val est = spark.table("hh_stream").collect()(0).getMap[String, Long](0).toMap
    // 64 items total, capacity 4 -> undercount bound 64/5
    assert(est.getOrElse("x", 0L) <= 50L && 50L - est.getOrElse("x", 0L) <= 64 / 5,
      s"streaming estimate out of bounds: $est")
  }

  test("SQL registration: heavy_hitters parses and enforces constant capacity") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq("a", "b", "a").toDF("v").createOrReplaceTempView("hh_in")
    val m = spark.sql("SELECT heavy_hitters(v, 4) AS mg FROM hh_in")
      .collect()(0).getMap[String, Long](0).toMap
    assert(m == Map("a" -> 2L, "b" -> 1L))
    val ex = intercept[Exception] {
      spark.sql("SELECT heavy_hitters(v, v) FROM (SELECT 1 AS v)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("constant") ||
      ex.getMessage.contains("foldable"), ex.getMessage)
  }
}
