package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Independent from-scratch replay of the q264 PCA gate (the
  * UnigramSpec/RerankSpec convention): exact Long Gram matrix + the same
  * left-to-right fold orders, re-implemented in plain Scala with no
  * shared code — plus a genuine convergence check (the gate's hash
  * compare proves determinism; the residual check proves the 24 rounds
  * actually found the eigenvector on realistic data).
  */
class PcaSpec extends SparkTestBase {

  private val Dim = 64
  private val Iters = 24

  /** Plain-Scala replay over a collected corpus: returns the 65 expected
    * (dim, val) rows in gate order. */
  private def replay(vs: Seq[Array[Double]]): Seq[(Long, Double)] = {
    val n = vs.length.toLong
    val qz = vs.map(v => v.map(x => math.floor(x * 100.0 + 0.5).toLong))
    val s = Array.tabulate(Dim)(i => qz.map(_(i)).sum)
    val g = Array.tabulate(Dim, Dim)((i, j) => qz.map(q => q(i) * q(j)).sum)
    val c = Array.tabulate(Dim, Dim)((i, j) => (n * g(i)(j) - s(i) * s(j)).toDouble)
    var v = Array.fill(Dim)(0.125)
    for (_ <- 1 to Iters) {
      // matvec and norm as left-to-right folds, exactly the gate's order
      val w = Array.tabulate(Dim) { i =>
        var acc = 0.0; var j = 0
        while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }; acc
      }
      var nw = 0.0; var i = 0
      while (i < Dim) { nw += w(i) * w(i); i += 1 }
      val inv = math.sqrt(nw)
      v = w.map(_ / inv)
    }
    val sgn = if (v.find(x => math.abs(x) > 1e-9).get < 0) -1.0 else 1.0
    val cv = Array.tabulate(Dim) { i =>
      var acc = 0.0; var j = 0
      while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }; acc
    }
    var lam = 0.0
    (0 until Dim).foreach(i => lam += v(i) * cv(i))
    var tr = 0.0
    (0 until Dim).foreach(i => tr += c(i)(i))
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

  test("q264 plan: the corpus-wide stage is one scan + a partial-agg exchange of O(d^2) cells") {
    val df = SparkEntry.queries("q264_pca_power")(spark, sf0001)
    val phys = df.queryExecution.executedPlan.toString
    // the Gram reduction must be a hash aggregate (map-side combinable),
    // never a corpus self-join or window over the corpus
    assert(phys.contains("HashAggregate"), "Gram cells via hash agg")
    assert(!phys.contains("CartesianProduct"), "no corpus cross join")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("window"), "no corpus-wide window")
  }
}
