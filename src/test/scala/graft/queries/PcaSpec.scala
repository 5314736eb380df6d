package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Independent from-scratch replay of the q264 PCA gate (the
  * UnigramSpec/RerankSpec convention): exact Long Gram matrix + the same
  * left-to-right fold orders, re-implemented in plain Scala with no
  * shared code — plus a genuine convergence check (the gate's hash
  * compare proves determinism; the residual check proves the iteration
  * budget actually found the eigenvectors on realistic data).
  */
class PcaSpec extends SparkTestBase {

  private val Dim = 64
  private val Iters = 96
  private val ChunkRounds = 16

  /** Plain-Scala replay over a collected corpus: returns the 65 expected
    * (dim, val) rows in gate order. */
  private def replay(vs: Seq[Array[Double]]): Seq[(Long, Double)] = {
    val n = vs.length.toLong
    val qz = vs.map(v => v.map(x => math.floor(x * 100.0 + 0.5).toLong))
    val s = Array.tabulate(Dim)(i => qz.map(_(i)).sum)
    val g = Array.tabulate(Dim, Dim)((i, j) => qz.map(q => q(i) * q(j)).sum)
    val c = Array.tabulate(Dim, Dim)((i, j) => (n * g(i)(j) - s(i) * s(j)).toDouble)
    var tr = 0.0
    (0 until Dim).foreach(i => tr += c(i)(i))
    val v = powerOn(c, tr, signFix = false)
    val sgn = if (v.find(x => math.abs(x) > 1e-9).get < 0) -1.0 else 1.0
    val cv = Array.tabulate(Dim) { i =>
      var acc = 0.0; var j = 0
      while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }; acc
    }
    var lam = 0.0
    (0 until Dim).foreach(i => lam += v(i) * cv(i))
    val loadings = (0 until Dim).map(i => ((i + 1).toLong, sgn * v(i)))
    loadings :+ (-1L, lam / tr)
  }

  private def corpus(dir: String): Seq[Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray).toSeq

  test("q264 == exact-integer-Gram power-iteration replay (sf0.001)") {
    val vs = corpus(sf0001)
    val expect = replay(vs)
    val got = SparkEntry.queries("q264_pca_power")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == Dim + 1)
    // row order: summary dim=-1 first, then dims 1..64
    assert(got.head._1 == -1L && got.tail.map(_._1).toSeq ==
      (1 to Dim).map(_.toLong))
    val em = expect.toMap
    got.foreach { case (d, x) =>
      assert(math.abs(x - em(d)) < 1e-12, s"dim $d: got $x want ${em(d)}")
    }
  }

  test("q264 power iteration converged: residual ||Cv - lam*v|| small, evr in (0,1]") {
    val vs = corpus(sf0001)
    val n = vs.length.toLong
    val qz = vs.map(v => v.map(x => math.floor(x * 100.0 + 0.5).toLong))
    val s = Array.tabulate(Dim)(i => qz.map(_(i)).sum)
    val c = Array.tabulate(Dim, Dim)((i, j) =>
      (n * qz.map(q => q(i) * q(j)).sum - s(i) * s(j)).toDouble)
    val rows = SparkEntry.queries("q264_pca_power")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val evr = rows.find(_._1 == -1L).get._2
    assert(evr > 0.0 && evr <= 1.0, s"explained-variance ratio $evr")
    val v = rows.filter(_._1 != -1L).sortBy(_._1).map(_._2)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-9, "PC1 is a unit vector")
    val cv = Array.tabulate(Dim)(i => (0 until Dim).map(j => c(i)(j) * v(j)).sum)
    val lam = (0 until Dim).map(i => v(i) * cv(i)).sum
    val resid = math.sqrt(
      (0 until Dim).map(i => math.pow(cv(i) - lam * v(i), 2)).sum) / math.abs(lam)
    assert(resid < 0.05, s"eigen-residual $resid after $Iters rounds")
    // sign convention: first non-tiny component is positive
    assert(v.find(x => math.abs(x) > 1e-9).get > 0)
  }

  // ---- q269 whitening ----------------------------------------------------

  /** Replay of the shared machinery up to (C, S, n). */
  private def covOf(vs: Seq[Array[Double]]): (Array[Array[Double]], Array[Long], Long) = {
    val n = vs.length.toLong
    val qz = vs.map(v => v.map(x => math.floor(x * 100.0 + 0.5).toLong))
    val s = Array.tabulate(Dim)(i => qz.map(_(i)).sum)
    val c = Array.tabulate(Dim, Dim)((i, j) =>
      (n * qz.map(q => q(i) * q(j)).sum - s(i) * s(j)).toDouble)
    (c, s, n)
  }

  /** Mirrors the gate exactly: ChunkRounds scaled matvecs then a
    * normalization, repeated, then one FINAL normalization (the gate
    * renormalizes before the sign fix). */
  private def powerOn(c: Array[Array[Double]], scale: Double,
      signFix: Boolean = true): Array[Double] = {
    def normed(v: Array[Double]): Array[Double] = {
      var nw = 0.0
      (0 until Dim).foreach(i => nw += v(i) * v(i))
      v.map(_ / math.sqrt(nw))
    }
    var v = Array.fill(Dim)(0.125)
    for (_ <- 1 to Iters / ChunkRounds) {
      for (_ <- 1 to ChunkRounds) {
        v = Array.tabulate(Dim) { i =>
          var acc = 0.0; var j = 0
          while (j < Dim) { acc += (c(i)(j) / scale) * v(j); j += 1 }; acc
        }
      }
      v = normed(v)
    }
    val nv = normed(v)
    if (!signFix) nv
    else {
      val sgn = if (nv.find(x => math.abs(x) > 1e-9).get < 0) -1.0 else 1.0
      nv.map(_ * sgn)
    }
  }

  private def rayOn(c: Array[Array[Double]], v: Array[Double]): Double = {
    var lam = 0.0
    (0 until Dim).foreach { i =>
      var acc = 0.0; var j = 0
      while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }
      lam += v(i) * acc
    }
    lam
  }

  test("q269 == deflation replay; components orthogonal; corpus-wide whitened variance = 1") {
    val vs = corpus(sf0001)
    val (c, s, n) = covOf(vs)
    var tr = 0.0
    (0 until Dim).foreach(i => tr += c(i)(i))
    val v1 = powerOn(c, tr)
    val lam1 = rayOn(c, v1)
    val c2 = Array.tabulate(Dim, Dim)((i, j) => c(i)(j) - lam1 * v1(i) * v1(j))
    val v2 = powerOn(c2, tr - lam1)
    val lam2 = rayOn(c2, v2)
    def proj(q: Array[Double], v: Array[Double], lam: Double): Double = {
      val qz = q.map(x => math.floor(x * 100.0 + 0.5).toLong)
      var acc = 0.0
      (0 until Dim).foreach(i => acc += (qz(i) - s(i).toDouble / n) * v(i))
      n * acc / math.sqrt(lam)
    }
    val got = SparkEntry.queries("q269_pca_whiten")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0L until 5L))
    got.foreach { case (id, w1, w2) =>
      assert(math.abs(w1 - proj(vs(id.toInt), v1, lam1)) < 1e-9, s"w1 of $id")
      assert(math.abs(w2 - proj(vs(id.toInt), v2, lam2)) < 1e-9, s"w2 of $id")
    }
    // geometry: components orthogonal, whitened coords unit-variance
    val dot12 = (0 until Dim).map(i => v1(i) * v2(i)).sum
    assert(math.abs(dot12) < 1e-3, s"v1.v2 = $dot12")
    def varOf(v: Array[Double], lam: Double): Double = {
      val ws = vs.map(q => proj(q, v, lam))
      val m = ws.sum / ws.length
      ws.map(w => (w - m) * (w - m)).sum / ws.length
    }
    // population variance of the whitened coordinate is 1 by
    // construction (C = n^2 * Cov); allow slack for the quantization
    assert(math.abs(varOf(v1, lam1) - 1.0) < 1e-6)
    assert(math.abs(varOf(v2, lam2) - 1.0) < 1e-6)
    // PC1 dominates: lam1 >= lam2 > 0
    assert(lam1 >= lam2 && lam2 > 0)
  }

  test("q276: element-wise merged slice grams == the whole-corpus gram, cell for cell") {
    import org.apache.spark.sql.functions._
    val qz = PcaQueries.quantized(spark, sf0001)
    val g = graft.functions.GraftFunctions.gram_sums(col("qv"), 64)
    val whole = qz.agg(g.as("gs")).collect().head.getSeq[Long](0)
    val a = qz.where(col("vec_id") % 2 === 0).agg(g.as("gs"))
      .collect().head.getSeq[Long](0)
    val b = qz.where(col("vec_id") % 2 =!= 0).agg(g.as("gs"))
      .collect().head.getSeq[Long](0)
    assert(whole.length == 1 + 64 + 64 * 65 / 2)
    assert(a.zip(b).map { case (x, y) => x + y } == whole)
    // and the gate's output equals q264's row for row
    val g264 = SparkEntry.queries("q264_pca_power")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val g276 = SparkEntry.queries("q276_pca_incremental")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(g264.toSeq == g276.toSeq)
  }

  test("q287: whole-corpus gram minus delete-set gram == retained gram, cell for cell") {
    import org.apache.spark.sql.functions._
    val qz = PcaQueries.quantized(spark, sf0001)
    val g = graft.functions.GraftFunctions.gram_sums(col("qv"), 64)
    val whole = qz.agg(g.as("gs")).collect().head.getSeq[Long](0)
    val del = qz.where(col("vec_id") % 5 === 0).agg(g.as("gs"))
      .collect().head.getSeq[Long](0)
    val retained = qz.where(col("vec_id") % 5 =!= 0).agg(g.as("gs"))
      .collect().head.getSeq[Long](0)
    assert(whole.zip(del).map { case (x, y) => x - y } == retained)
    // gate sanity (the oracle already pins unlearned == direct
    // recompute over the retained corpus, to the byte)
    val g287 = SparkEntry.queries("q287_pca_unlearning")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(g287.length == 65 && g287.last._1 == 64L)
    // summary row: explained variance in (0, 1]
    val ev = g287.head
    assert(ev._1 == -1L && ev._2 > 0 && ev._2 <= 1.0)
  }

  test("plan: the corpus-wide stage is one scan + a partial-agg exchange of O(d^2) cells") {
    // inspect the BUILD lineage (the gates checkpoint it, so their own
    // executed plans read an RDD scan — the FrameMemo convention)
    val df = PcaQueries.covFrame(spark, sf0001)
    val phys = df.queryExecution.executedPlan.toString
    // the Gram reduction must be a hash aggregate (map-side combinable),
    // never a corpus self-join or window over the corpus
    assert(phys.contains("HashAggregate"), "Gram cells via hash agg")
    assert(!phys.contains("CartesianProduct"), "no corpus cross join")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("window"), "no corpus-wide window")
  }
}
