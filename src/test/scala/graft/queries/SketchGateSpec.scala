package graft.queries

import graft.SparkTestBase
import graft.functions.GraftFunctions

import org.apache.spark.sql.functions._

/** Pins for the round-9 sketch gates: KMV mergeability/determinism
  * and the exact power-of-two decay arithmetic. */
class SketchGateSpec extends SparkTestBase {

  import spark.implicits._

  test("KMV bottom-k is partitioning-invariant (union-mergeable state)") {
    GraftFunctions.register(spark)
    val vals = (1L to 5000L).map(i => ("g", i * 2654435761L % 1000003L))
      .toDF("g", "h").distinct()
    val a = vals.groupBy(col("g"))
      .agg(GraftFunctions.min_k(col("h"), 64).as("mk"))
      .collect().head.getSeq[Long](1)
    val b = vals.repartition(13).groupBy(col("g"))
      .agg(GraftFunctions.min_k(col("h"), 64).as("mk"))
      .collect().head.getSeq[Long](1)
    assert(a == b)
    assert(a.length == 64 && a == a.sorted)
  }

  test("KMV estimate is within tolerance on a known-cardinality set") {
    // n distinct uniform-ish 56-bit hashes from md5 — the gate's space
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = 4000
    val hs = (1 to n).map { i =>
      java.lang.Long.parseLong(
        md.digest(s"v$i".getBytes("UTF-8")).map(b => f"$b%02x")
          .mkString.take(14), 16)
    }.distinct
    val hk = hs.sorted.apply(63)
    val est = 63L * 72057594037927936L / hk
    assert(math.abs(est - hs.size) * 100 <= hs.size.toLong * 30,
      s"est=$est exact=${hs.size}")
  }

  test("power-of-two decay: hand-derived weights, wrap-safe shift cap") {
    // bucket 0 -> 1000000, 1 -> 500000, 20 -> 0 (integer shift floor)
    assert((1000000L >> 0) == 1000000L && (1000000L >> 1) == 500000L)
    assert((1000000L >> 20) == 0L)
    // Java's >> wraps mod 64: an uncapped age of 64 buckets would
    // resurrect full weight — the gate caps at 62
    assert((1000000L >> 64) == 1000000L)
    assert((1000000L >> 62) == 0L)
  }

  test("q226: wide-agg counters match a driver-side md5 reference (per-group sums, chk, est)") {
    import org.apache.spark.sql.functions._
    // independent reference: JVM MessageDigest over the collected token
    // stream (sf0.001 is small), vs the gate's one-pass 16-column agg
    val toks = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .collect().map(_.getString(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(r: Int, t: String): Long = {
      val hex = md.digest(s"ams$r:$t".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(7)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    val x = (0 until 16).map(r => toks.map(sign(r, _)).sum)
    // each counter is a sum of N signs, so X_r == N (mod 2)
    x.foreach(xr => assert(((xr - toks.length) & 1L) == 0L))
    val refGrp = (0 until 4).map { g =>
      val sumSq = (0 until 4).map(j => x(4 * g + j) * x(4 * g + j)).sum
      val chk = (0 until 4).map(j => x(4 * g + j) * (4 * g + j + 1)).sum
      (g.toLong, sumSq, chk)
    }
    val refEst = refGrp.map(_._2).sorted.apply(1) / 4
    val got = graft.SparkEntry.queries("q226_ams_f2")(spark, sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == refGrp, got.mkString(", "))
    assert(got.head._4 == refEst, s"est ${got.head._4} != $refEst")
  }

  test("q226 streaming: AMS counters accumulate across micro-batches (complete mode)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the tug-of-war counters are plain mergeable sums, so the sketch
    // runs AT INGEST as a streaming aggregation — same sign family as
    // the q226 gate, both sides of this test share the expression so
    // the property is purely "streaming accumulation == batch"
    def sign(r: Int) =
      when(conv(substring(md5(concat(lit(s"ams$r:"), col("t"))), 1, 7),
        16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L)
    val aggs = (0 until 16).map(r => sum(sign(r)).cast("long").as(s"x$r"))
    val b1 = Seq((1L, "alpha beta gamma alpha"), (2L, "delta beta"))
    val b2 = Seq((3L, "gamma gamma epsilon"), (4L, "alpha zeta"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(aggs.head, aggs.tail: _*)
      .writeStream.format("memory").queryName("ams_stream")
      .outputMode("complete").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("ams_stream").collect().head.toSeq
    val batch = (b1 ++ b2).toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(aggs.head, aggs.tail: _*).collect().head.toSeq
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("q243: CMS inner product never underestimates; est = min of row dots") {
    val rows = graft.SparkEntry.queries("q243_join_size_sketch")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(5)))
    assert(rows.length == 4)
    val est = rows.head._3; val exact = rows.head._4
    assert(rows.forall(_._5), s"underestimate: est=$est exact=$exact")
    assert(rows.map(_._2).min == est, "est != min row dot")
    assert(rows.forall(_._2 >= exact), "a row dot under the exact size")
  }

  test("q227: sketch median/MAD bracket the exact values within the grid error") {
    import org.apache.spark.sql.functions._
    val exact = graft.sources.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (f, vs0) =>
        val vs = vs0.map(_._2).sorted
        val m = vs((vs.length - 1) / 2) // disc lower-middle, q216 convention
        val avs = vs.map(v => math.abs(v - m)).sorted
        f -> (m, avs((avs.length - 1) / 2))
      }
    val got = graft.SparkEntry.queries("q227_mad_sketch")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case (f, (m, mad)) =>
      val (me, made) = got(f)
      // the estimate is the LOWER BOUND of the bucket holding the
      // median rank: est <= exact < est * (1 + 2^-5) + 1
      assert(me <= m && m <= me + me / 32 + 1, s"$f med est=$me exact=$m")
      // MAD's second sketch centers on the approx median, so the bound
      // compounds: hold it to 2x the grid's relative error
      assert(math.abs(made - mad).toDouble <= mad / 16.0 + 2,
        s"$f mad est=$made exact=$mad")
    }
  }
}
