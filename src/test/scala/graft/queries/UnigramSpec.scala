package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Independent plain-Scala replay of the q258 unigram-LM Viterbi
  * tokenizer (the WordPieceSpec convention): vocabulary induction and
  * the exact min-cost DP recomputed with none of the gate's Spark
  * expressions, then compared row-for-row. */
class UnigramSpec extends SparkTestBase {

  private val MaxLen = 12
  private val VocabN = 48
  private val Penalty = 30000000L

  test("q258 equals a from-scratch Scala Viterbi on sf0.001") {
    val words = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
      .filter(w => w.nonEmpty && w.length <= MaxLen)
    val counts = words.groupBy(identity).view.mapValues(_.length.toLong).toMap

    // vocabulary: substrings of length 1..4 weighted by corpus count
    val wgt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- counts; n <- 1 to 4; i <- 0 to w.length - n)
      wgt(w.substring(i, i + n)) = wgt.getOrElse(w.substring(i, i + n), 0L) + c
    val tot = wgt.values.sum
    val vocab = wgt.toSeq.sortBy { case (p, g) => (-g, p) }.take(VocabN)
      .map { case (p, g) =>
        p -> -math.floor(math.log(g.toDouble / tot) * 1e6 + 0.5).toLong
      }.toMap

    // exact DP over (cost, n_pieces, checksum) with lexicographic min
    def viterbi(w: String): (Long, Long, Long) = {
      val best = Array.fill(w.length + 1)((Long.MaxValue, 0L, 0L))
      best(0) = (0L, 0L, 0L)
      for (i <- 1 to w.length; j <- 1 to math.min(4, i)) {
        val start = i - j
        val piece = w.substring(start, i)
        val costOpt = vocab.get(piece)
          .orElse(if (j == 1) Some(Penalty) else None)
        for (c <- costOpt if best(start)._1 != Long.MaxValue) {
          val cand = (best(start)._1 + c, best(start)._2 + 1,
            best(start)._3 + (start + 1).toLong * j)
          // lexicographic (cost, pieces, checksum) — the packed-BIGINT
          // order the gate's single-value min implements
          if (Ordering[(Long, Long, Long)].lt(cand, best(i))) best(i) = cand
        }
      }
      best(w.length)
    }

    val expectDetail = counts.toSeq
      .map { case (w, c) => val (m, np, chk) = viterbi(w); (w, c, m, np, chk) }
      .sortBy { case (w, c, _, _, _) => (-c, w) }.take(20)
    val all = counts.toSeq.map { case (w, c) =>
      val (m, np, chk) = viterbi(w); (c, m * c, np * c, chk * c)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))

    val got = graft.SparkEntry.queries("q258_unigram_viterbi")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.take(expectDetail.length).toSeq == expectDetail,
      s"\ngot:    ${got.take(5).mkString(",")}\nexpect: ${expectDetail.take(5).mkString(",")}")
    assert(got.last == (("<ALL>", all._1, all._2, all._3, all._4)), got.last)
    // the DP genuinely beats greedy somewhere or ties it everywhere:
    // min-cost is <= any left-to-right greedy segmentation by def;
    // sanity: every word decomposes into >= 1 piece
    assert(expectDetail.forall(_._4 >= 1))
  }
}
