package graft.operators

import graft.SparkTestBase
import graft.queries.SimilarityQueries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PQ is approximate by design, so the q101 oracle gate only proves
  * both engines compute the SAME approximation. This spec pins the
  * properties the gate cannot: training determinism, the zero-shuffle
  * encode plan, code validity, and — because the whole pipeline is
  * deterministic — the fixture's exact retrieval quality (recall vs
  * brute force, self-retrieval) as a regression bound. */
class PqIndexSpec extends SparkTestBase {

  private def corpus: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
  }

  test("training is deterministic: two runs give the identical codebook") {
    val a = PqIndex.train(corpus, 1).collect().map(_.toString).sorted
    val b = PqIndex.train(corpus, 1).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("codebook shape: one cw per surviving (m, c), SubDim coordinates each") {
    val cb = PqIndex.train(corpus, 1).collect()
    assert(cb.length == PqIndex.M * PqIndex.Ks,
      s"no codeword should lose all members on this fixture: ${cb.length}")
    assert(cb.forall(_.getSeq[Double](2).length == PqIndex.SubDim))
  }

  test("encode is a map-only plan over the corpus: no Exchange") {
    val cb = PqIndex.train(corpus, 1)
    // encode a frame read straight from parquet (no test-side
    // repartition) — the corpus side must stay shuffle-free; the
    // codebook side is one broadcast row
    val plan = PqIndex.encode(corpus, cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("codes are valid: M entries, each a surviving code of its subspace") {
    val cb = PqIndex.train(corpus, 1)
    val valid = cb.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val codes = PqIndex.encode(corpus, cb)
      .select(col("vec_id"), col("codes")).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length == PqIndex.M)
      cs.zipWithIndex.foreach { case (c, m) =>
        assert(valid.contains((m.toLong, c)), s"vec ${r.getLong(0)}: ($m, $c)")
      }
    }
  }

  private def bruteSet: Set[(Long, Long)] =
    SimilarityQueries.bruteForceTopK(spark, sf0001)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallAndSelfCheck(res: Array[org.apache.spark.sql.Row]): Double = {
    val bf = bruteSet
    // every query is a corpus member and must retrieve itself first
    res.filter(_.getLong(2) == 1L).foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"rank-1 of ${r.getLong(0)}")
    }
    res.count(r => bf.contains((r.getLong(0), r.getLong(1)))).toDouble / bf.size
  }

  test("retrieval quality is pinned: recall@10 >= 0.7, perfect self-retrieval") {
    val pq = SimilarityQueries.pqAdcTopK(spark, sf0001)
      .select(col("qid"), col("nid"), col("rank")).collect()
    // deterministic pipeline -> deterministic recall; 0.76 measured on
    // this fixture (near-orthogonal random vectors — PQ's hardest case)
    assert(recallAndSelfCheck(pq) >= 0.7, "PQ recall")
  }

  test("IVF x PQ probe-limited search: recall@10 strictly above full-scan PQ") {
    val comp = SimilarityQueries.ivfPqTopK(spark, sf0001)
      .select(col("qid"), col("nid"), col("rank")).collect()
    // 0.78 measured with 3 of 16 cells probed — restricting ADC to the
    // best cells also prunes quantization-noise competitors out of the
    // shortlist, so the composed search BEATS the 0.76 full scan here
    val recall = recallAndSelfCheck(comp)
    assert(recall > 0.76, s"IVF-PQ recall $recall must beat the 0.76 PQ pin")
  }

  test("residual (two-stage) PQ: recall@10 strictly above single-stage PQ") {
    val rq = SimilarityQueries.rqAdcTopK(spark, sf0001)
      .select(col("qid"), col("nid"), col("rank")).collect()
    // 0.78 measured at sf0.001 (0.84 at sf0.01) vs 0.76 single-stage:
    // the stage-2 codebook halves the ADC approximation error
    val recall = recallAndSelfCheck(rq)
    assert(recall > 0.76, s"residual-PQ recall $recall must beat the 0.76 pin")
  }

  test("nprobe recall curve is monotone non-decreasing with a real spread") {
    // the sweep's rerank width scales with nprobe (PqShortlist x np);
    // a FIXED shortlist measurably inverts the curve (0.78 -> 0.72 at
    // sf0.01 going 1 -> 8 cells) because more ADC candidates compete
    // for the same rerank slots. Deterministic pipeline -> the curve
    // is a stable regression pin, not a flaky statistic.
    val curve = SimilarityQueries.ivfPqRecallCurve(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    curve.sliding(2).foreach { case Array((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, s"recall dropped $r1 -> $r2 going nprobe $np1 -> $np2")
    }
    assert(curve.last._2 > curve.head._2,
      s"probing half the index must beat one cell: ${curve.toSeq}")
    assert(curve.head._2 >= 0.5 && curve.last._2 <= 1.0, curve.toSeq.toString)
  }

  test("IVF-PQ probe plan: broadcast probe side, partial top-k below the exchange") {
    // artifacts exist after the recall test above; the probe must scan
    // them with the tiny probe set broadcast (never shuffling the code
    // table for the join) and push a partial WindowGroupLimit below
    // the shortlist exchange so only ~shortlist rows per query cross
    val plan = SimilarityQueries.ivfPqTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(30).mkString("\n"))
    assert(plan.contains("WindowGroupLimit"), "partial top-k must exist")
    assert(!plan.contains("CartesianProduct"), "no all-pairs anywhere")
  }

  test("residual computation reconstructs: residual + codeword = original subvector") {
    val cb = PqIndex.train(corpus, 1)
    val enc = PqIndex.encode(corpus, cb)
    val resid = enc.crossJoin(broadcast(PqIndex.codebookRow(cb)))
      .select(col("vec_id"), col("v"),
        PqIndex.residual(col("v"), col("codes"),
          PqIndex.codebookMap(col("cbs"))).as("r"),
        col("codes"))
      .limit(20).collect()
    val cwOf = cb.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    resid.foreach { row =>
      val v = row.getSeq[Double](1); val r = row.getSeq[Double](2)
      val codes = row.getSeq[Long](3)
      assert(r.length == v.length)
      for (m <- 0 until PqIndex.M; i <- 0 until PqIndex.SubDim) {
        val recon = cwOf((m.toLong, codes(m)))(i)
        val got = r(m * PqIndex.SubDim + i) + recon
        assert(math.abs(got - v(m * PqIndex.SubDim + i)) < 1e-12,
          s"vec ${row.getLong(0)} m=$m i=$i")
      }
    }
  }
}
