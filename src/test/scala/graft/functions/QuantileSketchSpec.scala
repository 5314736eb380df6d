package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The HDR-style quantile sketch: deterministic bucketing invariants,
  * partition independence (the property KLL/t-digest cannot offer),
  * and the guaranteed 2^-bits relative error of rank estimates. */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val Bits = 5

  private def sketchOf(df: DataFrame): Map[Long, Long] = {
    GraftFunctions.register(spark)
    val r = df.agg(GraftFunctions.quantile_sketch(col("v"), Bits).as("sk"))
      .collect().head
    if (r.isNullAt(0)) Map.empty
    else r.getMap[Long, Long](0).toMap
  }

  // deterministic long-tailed values (squares stretch the range so
  // several octaves populate)
  private def values: Seq[Long] =
    (1 to 5000).map(i => (i.toLong * i) % 1000004L)

  test("bucket/lowerBound invariants: lower <= v, relative error < 2^-bits") {
    val probe = (0L to 2000L) ++ Seq(4095L, 4096L, 4097L, 1L << 40,
      (1L << 40) + 12345L, Long.MaxValue / 3)
    probe.foreach { v =>
      val b = QuantileSketchAgg.bucketOf(v, Bits)
      val lo = QuantileSketchAgg.bucketLowerBound(b, Bits)
      assert(lo <= v, s"v=$v")
      assert((v - lo) * (1L << Bits) <= v, s"v=$v lo=$lo")
      // small values are exact
      if (v < (1L << (Bits + 1))) assert(lo == v)
      // bucket index is monotone in the value
      assert(QuantileSketchAgg.bucketOf(v + 1, Bits) >= b)
    }
  }

  test("counts conserve the stream and the grid stays bounded") {
    val sk = sketchOf(values.toDF("v"))
    assert(sk.values.sum == values.length.toLong)
    assert(sk.size <= (64 - Bits + 2) * (1 << Bits),
      s"grid must stay bounded, got ${sk.size} cells")
  }

  test("the sketch is partitioning-independent (pure cell sums)") {
    val df = values.toDF("v")
    val a = sketchOf(df.repartition(32))
    val b = sketchOf(df.repartition(3))
    val c = sketchOf(df.coalesce(1))
    assert(a == b && b == c)
  }

  test("rank estimates respect the guaranteed relative error bound") {
    val sk = sketchOf(values.toDF("v")).toSeq.sortBy(_._1)
    val sorted = values.sorted
    val n = sorted.length
    Seq(0.5, 0.9, 0.99, 1.0).foreach { q =>
      val r = math.max(1, math.ceil(q * n).toLong)
      val exact = sorted((r - 1).toInt)
      // walk the grid exactly as q113 does
      var cum = 0L
      val bucket = sk.find { case (_, c) => cum += c; cum >= r }.get._1
      val est = QuantileSketchAgg.bucketLowerBound(bucket, Bits)
      assert(est <= exact, s"q=$q est=$est exact=$exact")
      assert((exact - est) * (1L << Bits) <= exact.max(1L),
        s"q=$q est=$est exact=$exact exceeds the 2^-$Bits bound")
    }
  }

  test("nulls are skipped; the empty group is NULL") {
    val withNulls = Seq[Option[Long]](Some(7L), None, Some(7L), None)
      .toDF("v")
    assert(sketchOf(withNulls) == Map(7L -> 2L))
    assert(sketchOf(Seq.empty[Long].toDF("v")).isEmpty)
  }

  test("negative values fail loudly (non-negative domain)") {
    val ex = intercept[Exception] {
      sketchOf(Seq(-1L).toDF("v"))
    }
    assert(ex.getMessage != null)
  }

  test("SQL registration path resolves and agrees with the column API") {
    GraftFunctions.register(spark)
    values.toDF("v").createOrReplaceTempView("qs_vals")
    val viaSql = spark.sql(s"SELECT quantile_sketch(v, $Bits) FROM qs_vals")
      .collect().head.getMap[Long, Long](0).toMap
    assert(viaSql == sketchOf(values.toDF("v")))
  }

  test("runs as streaming state: the grid is exact across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    GraftFunctions.register(spark)
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("v")
      .agg(GraftFunctions.quantile_sketch(col("v"), Bits).as("sk"))
      .writeStream.format("memory").queryName("qs_stream")
      .outputMode("complete").start()
    val (first, second) = values.splitAt(values.length / 3)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("qs_stream").collect()
      .head.getMap[Long, Long](0).toMap
    // cell counts are pure sums, so the streamed sketch must equal the
    // batch sketch over the concatenated data exactly
    assert(streamed == sketchOf(values.toDF("v")))
  }

  test("rejects non-BIGINT values and non-constant bits at analysis time") {
    GraftFunctions.register(spark)
    values.toDF("v").createOrReplaceTempView("qs_vals")
    intercept[Exception] {
      spark.sql("SELECT quantile_sketch(CAST(v AS DOUBLE), 5) FROM qs_vals")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT quantile_sketch(v, CAST(v AS INT)) FROM qs_vals")
        .collect()
    }
  }
}
