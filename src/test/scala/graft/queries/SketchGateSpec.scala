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
}
