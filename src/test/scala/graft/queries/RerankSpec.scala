package graft.queries

import graft.{SparkEntry, SparkTestBase}

import org.apache.spark.sql.functions._

/** Independent from-scratch replays of the re-ranking gates (the
  * UnigramSpec convention): each algorithm is re-implemented naively in
  * plain Scala over the collected fixture and compared row-for-row
  * against the gate's DataFrame output. The replay shares NO code with
  * the queries — only the spec's own left-to-right double folds — so a
  * semantic drift in either side breaks the suite.
  */
class RerankSpec extends SparkTestBase {

  private val Fix = "/tmp/rerankfix"
  private val NumQ = 5

  /** 40 vectors in two tight clusters (even ids → A, odd → B) — same
    * geometry as SimilaritySpec's fixture but a different seed, so the
    * two suites can't silently share expectations. */
  private def writeFixture(): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val centA = Array.fill(64)(rnd.nextGaussian())
    val centB = Array.fill(64)(rnd.nextGaussian())
    val rows = (0 until 40).map { i =>
      val cent = if (i % 2 == 0) centA else centB
      val v = cent.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, (i % 2).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$Fix/embeddings.parquet")
  }

  /** Collected corpus as (id -> double vector), floats widened exactly
    * as the gates do (element-wise float→double cast). */
  private def corpus(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$Fix/embeddings.parquet").collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap

  /** Left-to-right fold, the repo-wide similarity arithmetic. */
  private def dot(a: Array[Double], b: Array[Double], d: Int): Double = {
    var s = 0.0; var i = 0
    while (i < d) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double], d: Int = 64): Double =
    dot(a, b, d) / (math.sqrt(dot(a, a, d)) * math.sqrt(dot(b, b, d)))

  // ---- q262 MMR --------------------------------------------------------

  test("q262 MMR == naive greedy replay (ids exact, scores to 1e-9)") {
    writeFixture()
    val vs = corpus()
    // naive replay: shortlist 20 by (sim desc, nid), then 5 greedy
    // rounds of argmax(0.7*sim - 0.3*max dsim to selected)
    val expect = (0L until NumQ).flatMap { q =>
      val sims = vs.keys.toSeq.map(n => n -> cos(vs(q), vs(n)))
        .sortBy { case (n, s) => (-s, n) }
      val short = sims.take(20)
      var sel = Vector(short.head._1 -> short.head._2) // pos 1 = raw top
      for (_ <- 2 to 5) {
        val cand = short.filterNot { case (n, _) => sel.exists(_._1 == n) }
        val scored = cand.map { case (n, s) =>
          val maxd = sel.map(p => cos(vs(n), vs(p._1))).max
          (n, 0.7 * s - 0.3 * maxd)
        }.sortBy { case (n, sc) => (-sc, n) }
        sel = sel :+ scored.head
      }
      sel.zipWithIndex.map { case ((n, sc), i) => (q, i + 1L, n, sc) }
    }
    val got = SparkEntry.queries("q262_mmr_rerank")(spark, Fix).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("pos"),
        r.getAs[Long]("nid"), r.getAs[Double]("score")))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((gq, gp, gn, gs), (eq, ep, en, es)) =>
      assert((gq, gp, gn) == (eq, ep, en), s"row ($gq,$gp): got $gn want $en")
      assert(math.abs(gs - es) < 1e-9, s"score drift at ($gq,$gp)")
    }
  }

  // ---- q263 binary quantization ---------------------------------------

  test("q263 sign-bit packing + Hamming rerank == naive replay") {
    writeFixture()
    val vs = corpus()
    def sig(v: Array[Double], base: Int): Long =
      (1 to 32).foldLeft(0L) { (acc, i) =>
        if (v(i + base - 1) >= 0) acc + (1L << (i - 1)) else acc
      }
    val packed = vs.map { case (n, v) => n -> (sig(v, 0), sig(v, 32)) }
    val expect = (0L until NumQ).flatMap { q =>
      val (qlo, qhi) = packed(q)
      val ham = packed.toSeq.map { case (n, (lo, hi)) =>
        (n, java.lang.Long.bitCount(lo ^ qlo).toLong +
          java.lang.Long.bitCount(hi ^ qhi).toLong)
      }.sortBy { case (n, h) => (h, n) }
      val short = ham.take(30)
      short.map { case (n, h) => (n, h, cos(vs(q), vs(n))) }
        .sortBy { case (n, _, s) => (-s, n) }
        .take(10).zipWithIndex
        .map { case ((n, h, s), i) => (q, n, h, s, i + 1L) }
    }
    val got = SparkEntry.queries("q263_binary_hamming_rerank")(spark, Fix)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._5) == ((e._1, e._2, e._3, e._5)),
        s"got $g want $e")
      assert(math.abs(g._4 - e._4) < 1e-9)
    }
    // self is Hamming-0 from its own signature, so it must lead every list
    got.filter(_._5 == 1L).foreach { g =>
      assert(g._1 == g._2 && g._3 == 0L, s"rank-1 not self: $g")
    }
  }

  // ---- q266 graph-ANN beam search --------------------------------------

  test("q266 beam search == naive replay over the collected kNN graph") {
    writeFixture()
    val vs = corpus()
    // the graph is the gate's own input artifact (shared with q148 et
    // al.) — collect it once, then replay the SEARCH from scratch
    val mut = SimilarityQueries.mutualKnnEdges(spark, Fix).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (mut ++ mut.map(_.swap)).groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).toSet }
    val deg = adj.map { case (k, ns) => k -> ns.size }
    val entries = deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(4)
      .map(_._1)
    val expect = (0L until NumQ).flatMap { q =>
      var beam: Set[Long] = entries.toSet
      for (_ <- 1 to 4) {
        val cand = beam ++ beam.flatMap(n => adj.getOrElse(n, Set.empty))
        beam = cand.toSeq.map(n => n -> cos(vs(q), vs(n)))
          .sortBy { case (n, s) => (-s, n) }.take(12).map(_._1).toSet
      }
      beam.toSeq.map(n => n -> cos(vs(q), vs(n)))
        .sortBy { case (n, s) => (-s, n) }.take(10).zipWithIndex
        .map { case ((n, s), i) => (q, i + 1L, n, s) }
    }
    val got = SparkEntry.queries("q266_graph_ann_beam")(spark, Fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert((g._1, g._2, g._3) == ((e._1, e._2, e._3)), s"got $g want $e")
      assert(math.abs(g._4 - e._4) < 1e-9)
    }
  }

  // ---- q268 matryoshka recall curve -------------------------------------

  test("q268: dim-64 row is exact-by-construction; curve bounded") {
    writeFixture()
    val rows = SparkEntry.queries("q268_matryoshka_recall")(spark, Fix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(16L, 32L, 64L))
    rows.foreach { case (d, hits, bp) =>
      assert(hits >= 0 && hits <= 50, s"dim $d hits $hits out of range")
      assert(bp == 10000L * hits / 50, s"dim $d bp not hits-derived")
    }
    // truncating to the FULL dimension is the exact search: recall 1
    assert(rows.find(_._1 == 64L).get._3 == 10000L)
    // prefix-16 replay: the truncated search really is cosine over the
    // first 16 dims (one query spot-checked end-to-end)
    val vs = corpus()
    val top16 = vs.keys.toSeq.map(n => n -> cos(vs(0L), vs(n), 16))
      .sortBy { case (n, s) => (-s, n) }.take(10).map(_._1).toSet
    val full = vs.keys.toSeq.map(n => n -> cos(vs(0L), vs(n)))
      .sortBy { case (n, s) => (-s, n) }.take(10).map(_._1).toSet
    val hits16 = rows.find(_._1 == 16L).get._2
    // replayed q0 overlap must be consistent with the reported total
    assert((top16 intersect full).size <= hits16)
  }

  // ---- q267 key-skew profiler -------------------------------------------

  test("q267 summary row matches a direct recompute on sf0.001") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val fan = li.groupBy("l_orderkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = SparkEntry.queries("q267_key_skew_profile")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val summary = got.find(_._1 == -1L).get
    assert(summary._2 == fan.map(_._2).max, "max_fanout")
    assert(summary._3 == fan.length.toLong, "n_keys")
    assert(summary._4 == fan.map(_._2).sum, "n_rows")
    val top = got.filter(_._1 != -1L)
    assert(top.length == 5)
    val expectTop = fan.sortBy { case (k, f) => (-f, k) }.take(5)
    assert(top.map(t => (t._1, t._2)).sortBy(t => (-t._2, t._1)).toSeq ==
      expectTop.toSeq)
  }

  test("q267 plans a bounded top-k (TakeOrderedAndProject), not a sort") {
    val df = SparkEntry.queries("q267_key_skew_profile")(spark, sf0001)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      "top-5 keys should be a bounded heap, not a global sort")
  }

  // ---- q280 MaxSim -----------------------------------------------------

  test("q280 MaxSim == naive late-interaction replay; rank-1 is self") {
    writeFixture()
    val vs = corpus()
    // the gate's integer quantization: floor(x * 2^14) per coordinate
    val qvs = vs.map { case (k, v) =>
      k -> v.map(x => math.floor(x * 16384).toLong)
    }
    def tokens(v: Array[Long]): Seq[Array[Long]] =
      (0 until 4).map(t => v.slice(t * 16, t * 16 + 16))
    def maxsim(q: Array[Long], d: Array[Long]): Long =
      tokens(q).map { qt =>
        tokens(d).map(dt =>
          qt.zip(dt).map { case (x, y) => x * y }.sum).max
      }.sum
    val expect = (0L until NumQ).flatMap { q =>
      qvs.keys.toSeq.map(n => (q, n, maxsim(qvs(q), qvs(n))))
        .sortBy { case (_, n, s) => (-s, n) }.take(5).zipWithIndex
        .map { case ((qid, nid, s), i) => (qid, nid, s, (i + 1).toLong) }
    }
    val got = SparkEntry.queries("q280_maxsim_rerank")(spark, Fix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
    // MaxSim is NOT norm-invariant, so self need not be rank-1 — but
    // the winner must score at least self, and in the two-cluster
    // geometry every top-5 hit shares the query's cluster (parity)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val self = maxsim(qvs(qid), qvs(qid))
      assert(rows.minBy(_._4)._3 >= self,
        s"query $qid: rank-1 score below self-score")
      rows.foreach { case (_, nid, _, _) =>
        assert(nid % 2 == qid % 2, s"query $qid matched cross-cluster $nid")
      }
    }
  }

  // ---- q293 NDCG -------------------------------------------------------

  test("q293 NDCG == naive replay; clustered fixture scores a perfect 10000") {
    writeFixture() // fixture labels ARE the parity clusters
    val vs = corpus()
    val wts = (1 to 10).map(i =>
      math.floor(1000000.0 / (math.log(i + 1) / math.log(2)) + 0.5).toLong)
    val expect = (0L until NumQ).map { q =>
      val top = vs.keys.toSeq.map(n => (n, cos(vs(q), vs(n))))
        .sortBy { case (n, s) => (-s, n) }.take(10)
      val dcg = top.zipWithIndex.map { case ((n, _), i) =>
        (if (n % 2 == q % 2) 1L else 0L) * wts(i)
      }.sum
      val nRel = vs.keys.count(_ % 2 == q % 2).toLong
      val idcg = wts.take(math.min(10L, nRel).toInt).sum
      (q, nRel, dcg, idcg, 10000L * dcg / idcg)
    }
    val got = graft.SparkEntry.queries("q293_ndcg_eval")(spark, Fix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // 20 same-cluster docs exist per query and cosine separates the
    // clusters, so every query's top-10 is all-relevant: NDCG = 10000
    got.foreach { case (q, _, _, _, bp) =>
      assert(bp == 10000L, s"query $q ndcg_bp $bp")
    }
  }
}
