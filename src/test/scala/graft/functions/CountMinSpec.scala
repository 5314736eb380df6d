package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val Width = 16

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] = {
    GraftFunctions.register(spark)
    df.agg(GraftFunctions.count_min(col("t"), Width).as("sk"))
      .collect().head.getSeq[Long](0).toArray
  }

  // 40 distinct tokens on 16 columns: collisions guaranteed
  private def tokens = (1 to 2000).map(i => s"tok${i % 40}").toDF("t")

  test("estimates never underestimate and each row sums to the stream length") {
    val sk = sketchOf(tokens)
    val exact = (1 to 2000).groupBy(i => s"tok${i % 40}").view.mapValues(_.size.toLong)
    (0 until CountMinAgg.Depth).foreach { d =>
      val row = sk.slice(d * Width, (d + 1) * Width)
      assert(row.sum == 2000L, s"row $d must count every item exactly once")
    }
    exact.foreach { case (tok, n) =>
      val est = (0 until CountMinAgg.Depth).map { d =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(s"cm$d:$tok".getBytes("UTF-8"))
        val bits28 = ((digest(0) & 0xffL) << 20) | ((digest(1) & 0xffL) << 12) |
          ((digest(2) & 0xffL) << 4) | ((digest(3) & 0xf0L) >> 4)
        sk(d * Width + (bits28 % Width).toInt)
      }.min
      assert(est >= n, s"$tok: est $est < true $n")
    }
  }

  test("the sketch is partitioning-independent (pure counter sums)") {
    val a = sketchOf(tokens.repartition(16))
    val b = sketchOf(tokens.repartition(2))
    assert(a.sameElements(b))
  }

  test("nulls are skipped, empty input gives the zero grid") {
    val sk = sketchOf(Seq(Some("x"), None, Some("x")).toDF("t"))
    assert(sk.sum == 2L * CountMinAgg.Depth)
    val empty = sketchOf(Seq.empty[String].toDF("t"))
    assert(empty.length == CountMinAgg.Depth * Width && empty.forall(_ == 0L))
  }

  test("SQL registration path resolves and agrees with the column API") {
    GraftFunctions.register(spark)
    tokens.createOrReplaceTempView("cm_toks")
    val viaSql = spark.sql(s"SELECT count_min(t, $Width) FROM cm_toks")
      .collect().head.getSeq[Long](0).toArray
    assert(viaSql.sameElements(sketchOf(tokens)))
  }

  test("runs as streaming state: counters are exact across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    GraftFunctions.register(spark)
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("t")
      .agg(GraftFunctions.count_min(col("t"), Width).as("sk"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    mem.addData(Seq.fill(30)("x") ++ Seq.fill(5)("y"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(20)("x") ++ Seq.fill(9)("z"): _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cm_stream").collect()
      .head.getSeq[Long](0).toArray
    // counters are pure sums, so the streamed sketch must equal the
    // batch sketch over the concatenated data exactly
    val batch = sketchOf(
      (Seq.fill(50)("x") ++ Seq.fill(5)("y") ++ Seq.fill(9)("z")).toDF("t"))
    assert(streamed.sameElements(batch))
  }

  test("misuse fails at analysis time with the constraint named") {
    GraftFunctions.register(spark)
    tokens.createOrReplaceTempView("cm_toks")
    val nonPositive = intercept[Exception] {
      spark.sql("SELECT count_min(t, 0) FROM cm_toks").collect()
    }
    assert(nonPositive.getMessage.contains("positive"), nonPositive.getMessage)
    val wrongType = intercept[Exception] {
      spark.sql("SELECT count_min(CAST(1 AS BIGINT), 16) FROM cm_toks").collect()
    }
    assert(wrongType.getMessage.contains("STRING"), wrongType.getMessage)
    val nonConstant = intercept[Exception] {
      spark.sql("SELECT count_min(t, CAST(length(t) AS INT)) FROM cm_toks").collect()
    }
    assert(nonConstant.getMessage.toLowerCase.contains("constant"),
      nonConstant.getMessage)
  }
}
