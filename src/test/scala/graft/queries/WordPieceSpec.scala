package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Driver-side plain-Scala replay of the q233 greedy segmentation —
  * independent of both the Catalyst HOF fold and the DuckDB unroll, so
  * a shared misunderstanding in the two gated engines can't hide. */
class WordPieceSpec extends SparkTestBase {

  private def wordCounts: Map[String, Long] =
    graft.sources.Tables.load(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def inducedVocab(wc: Map[String, Long]): Set[String] = {
    val wgt = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (n <- 2 to 4; i <- 0 to w.length - n)
        wgt.updateWith(w.substring(i, i + n))(p => Some(p.getOrElse(0L) + c))
    }
    wgt.toSeq.sortBy { case (p, g) => (-g, p) }.take(64).map(_._1).toSet
  }

  private def greedy(word: String, vocab: Set[String]): (Long, Long) = {
    var pos = 1; var np = 0L; var chk = 0L; var steps = 0
    while (pos <= word.length && steps < 24) {
      val rem = word.length - pos + 1
      val st = (4 to 2 by -1).find(n =>
        rem >= n && vocab.contains(word.substring(pos - 1, pos - 1 + n)))
        .getOrElse(1)
      np += 1; chk += pos.toLong * st; pos += st; steps += 1
    }
    (np, chk)
  }

  test("q233: plain-Scala greedy reference reproduces every row including the summary") {
    val wc = wordCounts
    val vocab = inducedVocab(wc)
    val segs = wc.map { case (w, c) => w -> greedy(w, vocab) }
    val expDetail = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(50)
      .map { case (w, c) => (w, c, segs(w)._1, segs(w)._2) }
    val expSummary = ("<ALL>", wc.values.sum,
      wc.map { case (w, c) => segs(w)._1 * c }.sum,
      wc.map { case (w, c) => segs(w)._2 * c }.sum)
    val got = graft.SparkEntry.queries("q233_wordpiece_encode")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (gotSummary, gotDetail) = got.partition(_._1 == "<ALL>")
    assert(gotDetail.toSet == expDetail.toSet,
      (gotDetail.toSet -- expDetail.toSet).take(3).toString)
    assert(gotSummary.head == expSummary, gotSummary.head.toString)
  }

  test("q233: greedy prefers the longest prefix (hand fixture)") {
    // vocab from this corpus contains "ab" with max weight; the word
    // "aba" greedily takes "ab"+"a": 2 pieces, chk = 1*2 + 3*1 = 5
    val vocab = Set("ab", "ba")
    assert(greedy("aba", vocab) == ((2L, 5L)))
    // fallback path: nothing matches -> singles
    assert(greedy("xyz", Set("ab")) == ((3L, 1L + 2L + 3L)))
    // a full 4-piece consumes in one step
    assert(greedy("abcd", Set("abcd")) == ((1L, 4L)))
  }
}
