package graft.operators

import graft.SparkTestBase

/** Semantics pins for distributed BPE training: greedy left-to-right
  * merges, frequency weighting across words, deterministic count-then-
  * lexicographic tie-break, early stop on exhaustion. */
class BpeTrainSpec extends SparkTestBase {

  import spark.implicits._

  test("the classic low/lower example learns the expected merge table") {
    val docs = Seq("low low lower").toDF("text")
    val merges = BpeTrain.train(docs, "text", 8)
    // hand-derived: (l,o) and (o,w) tie at 3, lexicographic picks
    // (l,o); then (lo,w) at 3; then (e,r) vs (low,e) tie at 1,
    // lexicographic picks (e,r); finally (low,er); then no pairs left
    assert(merges.map(m => (m.round, m.merged, m.n)) == Seq(
      (1, "|lo|", 3L), (2, "|low|", 3L), (3, "|er|", 1L),
      (4, "|lower|", 1L)))
  }

  test("merging is greedy left-to-right within a word") {
    // "aaa": pairs (a,a) x2 weighted once each -> merge (a,a);
    // greedy left fold gives [aa, a], so round 2 merges (aa, a)
    val docs = Seq("aaa").toDF("text")
    val merges = BpeTrain.train(docs, "text", 3)
    assert(merges.map(_.merged) == Seq("|aa|", "|aaa|"))
    assert(merges.head.n == 2L) // both adjacent (a,a) pairs counted
  }

  test("encodeCounts applies trained merges: hand-derived symbol counts") {
    val docs = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", 8)
    // full training merges to |low| and |lower| single symbols
    val got = BpeTrain.encodeCounts(docs, "text", "doc_id", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 3L), (2L, 1L, 1L)))
  }

  test("encodeCounts with no merges counts characters; merges never increase it") {
    val docs = Seq((1L, "ab cde")).toDF("doc_id", "text")
    val none = BpeTrain.encodeCounts(docs, "text", "doc_id", Seq.empty)
      .collect().head
    assert((none.getLong(1), none.getLong(2)) == (2L, 5L))
    val merges = BpeTrain.train(docs, "text", 2)
    val some = BpeTrain.encodeCounts(docs, "text", "doc_id", merges)
      .collect().head
    assert(some.getLong(2) <= 5L)
  }

  test("training stops when every word is a single symbol") {
    val docs = Seq("ab ab cd").toDF("text")
    val merges = BpeTrain.train(docs, "text", 10)
    // (a,b) at 2, then (c,d) at 1 — nothing left after 2 rounds
    assert(merges.length == 2)
    assert(merges.map(_.merged) == Seq("|ab|", "|cd|"))
  }

  test("pair counts weight by word frequency, not distinct words") {
    val docs = Seq("xy xy xy z", "xy").toDF("text")
    val merges = BpeTrain.train(docs, "text", 1)
    assert(merges.head.pair == "|x| |y|" && merges.head.n == 4L)
  }
}
