package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").select(col("doc_id"),
      split(col("text"), " ").as("t"))

  test("bucketWeights: bounded rows, target-heavy buckets weigh positive") {
    val raw = toks(
      1L -> "alpha alpha beta", 2L -> "beta gamma gamma",
      3L -> "alpha beta gamma")
    val target = toks(1L -> "alpha alpha alpha alpha")
    val w = Dsir.bucketWeights(raw, target, "t", numBuckets = 64).collect()
    assert(w.length <= 64)
    val byBucket = w.map(r => r.getLong(0) -> r.getLong(1)).toMap
    def b(word: String) = Seq(word).toDF("w")
      .select(Dsir.bucket(col("w"), 64)).head().getLong(0)
    // alpha dominates the target → its bucket's p_target > p_raw;
    // gamma never appears in the target → p_target < p_raw
    assert(byBucket(b("alpha")) > 0)
    assert(byBucket(b("gamma")) < 0)
  }

  test("score: exact micro-nat sum of the doc's bucket weights") {
    val raw = toks(1L -> "x y", 2L -> "x x")
    val target = toks(1L -> "x")
    val w = Dsir.bucketWeights(raw, target, "t", numBuckets = 16)
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def b(word: String) = Seq(word).toDF("w")
      .select(Dsir.bucket(col("w"), 16)).head().getLong(0)
    val scored = Dsir.score(raw, "doc_id", "t", w, numBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(1L) === wm(b("x")) + wm(b("y")))
    assert(scored(2L) === 2 * wm(b("x")))
  }

  test("select: Gumbel-top-k is deterministic and ordered") {
    // long docs so the score gap (~tokens × weight) dwarfs the
    // Gumbel noise (stddev ~1.28e6 micro-nats)
    val even = Seq.fill(8)("even token stream").mkString(" ")
    val odd = Seq.fill(8)("odd words here").mkString(" ")
    val raw = toks((1L to 40L).map(i =>
      i -> (if (i % 2 == 0) even else odd)): _*)
    val target = toks(0L -> "even token stream")
    val w = Dsir.bucketWeights(raw, target, "t", numBuckets = 128)
    val scored = Dsir.score(raw, "doc_id", "t", w, numBuckets = 128)
    val a = Dsir.select(scored, "doc_id", 10, "s1").collect()
    val b = Dsir.select(scored, "doc_id", 10, "s1").collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    val keys = a.map(_.getAs[Long]("key_micro")).toSeq
    assert(keys === keys.sorted.reverse)
    assert(a.length === 10)
    // the target-matching (even) docs must dominate the selection
    val evens = a.count(_.getLong(0) % 2 == 0)
    assert(evens >= 8, s"expected target-like docs to dominate, got $evens/10")
  }

  test("scoring joins the weight table broadcast — corpus never reshuffled") {
    val raw = toks((1L to 20L).map(i => i -> "a b c d"): _*)
    val w = Dsir.bucketWeights(raw, raw.limit(5), "t", numBuckets = 32)
    val plan = Dsir.score(raw, "doc_id", "t", w, numBuckets = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast weight join, got:\n$plan")
  }
}
