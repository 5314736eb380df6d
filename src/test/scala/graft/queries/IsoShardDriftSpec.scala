package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Independent replays for the q283/q284/q285 block: sequential PAVA
  * (the gate runs the minimax identity — truncation commutes with
  * min/max, so floor(PAVA fit) must match cell-for-cell), full Scala
  * rendezvous hashing (pinning HRW's minimal-movement theorem on real
  * data), and a from-scratch Wasserstein integral. */
class IsoShardDriftSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q283 isotonic fit == floor of sequential PAVA over the bins") {
    val rows = SparkEntry.queries("q283_isotonic_calibration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // rebuild (n, n_pos) per bin from the gate's own n and obs_bp is
    // lossy — recompute n_pos independently from the documents
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(t: String): Long = java.lang.Long.parseLong(
      md.digest(("w:" + t).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7), 16) % 10000L - 5000L
    val per = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("text", "n_chars").collect().map { r =>
      val score = r.getString(0).split(" ", -1).map(weight).sum
      val pBp = math.max(0L, math.min(159999L, score + 80000L)) / 16L
      (pBp / 1000L, r.getLong(1) >= 300L)
    }
    val bins = per.groupBy(_._1).map { case (b, rs) =>
      (b, rs.length.toLong, rs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    assert(bins.map(b => (b._1, b._2)) == rows.map(r => (r._1, r._2)).toSeq)
    // classic sequential pool-adjacent-violators on exact rationals
    // (block mean = num/den with num in micro-units; violators pool
    // while the previous block's mean >= the incoming one's)
    val blocks = {
      val s2 = scala.collection.mutable.Stack[(Long, Long, Int)]() // num, den, nbins
      bins.foreach { case (_, n, pos) =>
        var (num, den, k) = (1000000L * pos, n, 1)
        while (s2.nonEmpty && s2.top._1 * den >= num * s2.top._2) {
          val t = s2.pop(); num += t._1; den += t._2; k += t._3
        }
        s2.push((num, den, k))
      }
      s2.toSeq.reverse
    }
    val pava = blocks.flatMap { case (num, den, k) =>
      Seq.fill(k)(num / den) // floor of the pooled mean, in micro
    }
    assert(rows.map(_._4).toSeq == pava,
      s"iso=${rows.map(_._4).toSeq} pava=$pava")
    // monotone by construction
    assert(pava == pava.sorted)
  }

  test("q284 rendezvous == full Scala replay; minimal movement is structural") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(doc: Long, shard: Long): Long = java.lang.Long.parseLong(
      md.digest(s"rdv:$doc:$shard".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def argmax(doc: Long, shards: Range): Long =
      shards.map(s => (w(doc, s), s)).maxBy(t => (t._1, -t._2))._2.toLong
    val moves = ids.map(d => (argmax(d, 0 until 8), argmax(d, 0 until 9)))
    // the theorem: a doc moves ONLY to the new shard
    moves.foreach { case (s8, s9) =>
      assert(s8 == s9 || s9 == 8L, s"HRW moved $s8 -> $s9 (not the new shard)")
    }
    val per = moves.groupBy(_._2).map { case (s, rs) =>
      (s, rs.count(r => r._1 == r._2).toLong, rs.length.toLong,
        rs.count(r => r._1 != r._2).toLong)
    }.toSeq
    val tot = (-1L, moves.count(r => r._1 == r._2).toLong,
      moves.length.toLong, 0L)
    val expect = (tot +: per).sortBy(_._1)
    val got = SparkEntry.queries("q284_rendezvous_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
    // and the gate's own summary row says zero off-target arrivals
    assert(got.head._1 == -1L && got.head._4 == 0L)
  }

  test("q285 Wasserstein == from-scratch CDF integral on sf0.001") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id % 2 AS half",
        "(CAST(round(value * 100) AS BIGINT) + 1000000000L) DIV 100 AS v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val h0 = ev.filter(_._1 == 0L).map(_._2).sorted
    val h1 = ev.filter(_._1 == 1L).map(_._2).sorted
    val grid = (h0 ++ h1).distinct.sorted
    def cdf(xs: Array[Long], v: Long): Long = xs.count(_ <= v).toLong
    val w1Scaled = grid.zip(grid.tail).map { case (v, nxt) =>
      (nxt - v) * math.abs(cdf(h0, v) * h1.length - cdf(h1, v) * h0.length)
    }.sum
    val got = SparkEntry.queries("q285_wasserstein_drift")(spark, sf)
      .collect().head
    assert(got.getLong(0) == grid.length.toLong)
    assert(got.getLong(1) == h0.length.toLong)
    assert(got.getLong(2) == h1.length.toLong)
    assert(got.getLong(3) == w1Scaled)
    assert(got.getLong(4) ==
      1000000L * w1Scaled / (h0.length.toLong * h1.length))
    // the halves genuinely differ on this fixture
    assert(w1Scaled > 0)
  }
}
