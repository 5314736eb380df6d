package graft.queries

import graft.SparkTestBase

/** Invariants of the q198 DoReMi-style MWU domain reweighting that the
  * oracle's value-hash can't state directly: bounded multiplicative
  * growth, loss-monotone ordering, and determinism. */
class LmMixSpec extends SparkTestBase {

  private lazy val rows =
    graft.SparkEntry.queries("q198_doremi_mix")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

  test("weights stay within the clamped multiplicative-growth envelope") {
    // per-round factor is within [ (K-C)/K, (K+C)/K ] = [0.5, 1.5]
    val lo = (1000000L * math.pow(0.5, 5)).toLong
    val hi = (1000000L * math.pow(1.5, 5)).toLong
    rows.foreach { case (src, _, w, _) =>
      assert(w >= lo && w <= hi, s"$src weight $w outside [$lo, $hi]")
    }
  }

  test("weights are monotone in domain loss") {
    // every domain sees the SAME mixture mean each round, so the
    // update factor — hence the final weight — is non-decreasing in
    // the domain's (constant) loss
    val byLoss = rows.sortBy(r => (r._2, r._1))
    byLoss.sliding(2).foreach {
      case Array((s1, l1, w1, _), (s2, l2, w2, _)) =>
        assert(l1 < l2 || w1 == w2 || (l1 == l2),
          s"$s1(loss=$l1,w=$w1) vs $s2(loss=$l2,w=$w2)")
        if (l1 < l2) assert(w1 <= w2,
          s"monotonicity broken: $s1(loss=$l1,w=$w1) > $s2(loss=$l2,w=$w2)")
      case _ =>
    }
  }

  test("rates are a normalization of the weights and reproduce exactly") {
    val wSum = rows.map(_._3).sum
    rows.foreach { case (src, _, w, bp) =>
      assert(bp == 10000L * w / wSum, s"$src rate_bp mismatch")
    }
    val again = graft.SparkEntry.queries("q198_doremi_mix")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }
}
