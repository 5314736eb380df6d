package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkTestBase {

  test("no false negatives, sane false-positive rate, merge is union") {
    val bits = new Array[Byte](8192 / 8)
    val keys = (0L until 500L).map(_ * 37 + 11)
    keys.foreach(BloomFilter.set(bits, _, 5))
    assert(keys.forall(BloomFilter.mightContain(bits, _, 5)),
      "an inserted key must always probe true")
    // 500 keys in 8192 bits, 5 hashes: expected fp rate well under 25%
    val probes = (1L to 2000L).map(_ * 1000003 + 7).filterNot(keys.contains)
    val fp = probes.count(BloomFilter.mightContain(bits, _, 5))
    assert(fp.toDouble / probes.size < 0.25, s"fp rate too high: $fp/${probes.size}")

    val a = new Array[Byte](64); val b = new Array[Byte](64)
    BloomFilter.set(a, 1L, 5); BloomFilter.set(b, 2L, 5)
    val merged = a.clone()
    var i = 0
    while (i < merged.length) { merged(i) = (merged(i) | b(i)).toByte; i += 1 }
    assert(BloomFilter.mightContain(merged, 1L, 5))
    assert(BloomFilter.mightContain(merged, 2L, 5))
  }

  test("bloom_agg builds distributed and the probe prunes in a codegen'd filter") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val keys = (0L until 200L).filter(_ % 3 == 0).toDF("k").repartition(4)
    val bloomRow = keys.agg(GraftFunctions.bloom_agg(col("k"), 4096, 5).as("bf"))
    val probed = (0L until 200L).toDF("x")
      .crossJoin(broadcast(bloomRow))
      .where(GraftFunctions.bloom_might_contain(col("bf"), col("x"), 5))
      .select(col("x"))
    val kept = probed.collect().map(_.getLong(0)).toSet
    // every true member survives; bloom may keep a few extras
    assert((0L until 200L).filter(_ % 3 == 0).forall(kept.contains))
    assert(kept.size < 200, "the probe must actually prune")
    // the probe participates in whole-stage codegen (the starred
    // stages in the plan string; a CodegenFallback expression would
    // strip the * from its enclosing operators)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) "), plan)
    assert(plan.contains("bloom_might_contain"), plan)
  }
}
