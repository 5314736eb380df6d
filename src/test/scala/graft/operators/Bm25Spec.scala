package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private def tokenized(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))

  test("scores match the hand-computed odds-idf BM25 on a tiny corpus") {
    // corpus: N=3, avgdl = (4+2+3)/3 = 3.0
    val docs = tokenized(
      1L -> "cat dog cat fish",   // dl=4, tf(cat)=2
      2L -> "dog dog",            // dl=2
      3L -> "bird bird bird")     // dl=3
    val got = Bm25.search(docs, "doc_id", "t", Seq("cat"), 10)
      .as[(Long, Double)].collect()
    // only doc 1 contains "cat": df=1, idf=(3-1+0.5)/(1+0.5)=5/3
    // norm = 2 + 1.2*(0.25 + 0.75*4/3.0) = 3.5; s = (5/3)*(2*2.2)/3.5
    val expected = ((3 - 1 + 0.5) / 1.5) * (2 * 2.2) /
      (2 + 1.2 * (0.25 + 0.75 * 4 / 3.0))
    assert(got.toSeq == Seq(1L -> expected))
  }

  test("per-document score is the fixed-order sum over matched terms") {
    val docs = tokenized(1L -> "cat dog", 2L -> "cat cat", 3L -> "emu emu")
    val both = Bm25.search(docs, "doc_id", "t", Seq("cat", "dog"), 10)
      .as[(Long, Double)].collect().toMap
    val catOnly = Bm25.search(docs, "doc_id", "t", Seq("cat"), 10)
      .as[(Long, Double)].collect().toMap
    val dogOnly = Bm25.search(docs, "doc_id", "t", Seq("dog"), 10)
      .as[(Long, Double)].collect().toMap
    // doc 1 matches both terms; its two-term score is exactly the sum
    assert(both(1L) == catOnly(1L) + dogOnly(1L))
    // doc 2 matches only "cat"; adding an unmatched term changes nothing
    assert(both(2L) == catOnly(2L))
    // doc 3 matches neither term and is absent everywhere
    assert(!both.contains(3L) && !catOnly.contains(3L))
  }

  test("k bounds the result and the cut is score-then-id deterministic") {
    val docs = tokenized((1L to 8L).map(i => i -> "cat"): _*)
    // all 8 docs tie exactly -> the 3 lowest ids must win
    val got = Bm25.search(docs, "doc_id", "t", Seq("cat"), 3)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("plan: top-k heap, broadcast stats, no cartesian on the data side") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val plan = Bm25.search(docs, "doc_id", "t",
      Seq("spark", "vector"), 20).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // the only nested-loop join is the 1-row corpus-scalars attach
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("empty and duplicate query term lists are rejected") {
    val docs = tokenized(1L -> "cat")
    intercept[IllegalArgumentException](
      Bm25.search(docs, "doc_id", "t", Nil, 5))
    intercept[IllegalArgumentException](
      Bm25.search(docs, "doc_id", "t", Seq("cat", "cat"), 5))
  }
}
