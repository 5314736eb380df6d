package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF retrain/rebalance verb: after heavy add/delete churn under
  * PINNED centroids, probe recall decays (the documented drift the
  * add/delete verbs accumulate); `rebalance` retrains from the
  * surviving corpus and restores it. Pins:
  *
  *  1. rebalance == a FRESH BUILD of the surviving corpus under the
  *     same parameters, bit-identically (the recall guarantee by
  *     construction);
  *  2. on a drifted corpus, nprobe-1 recall@10 of the drifted
  *     population is measurably LOWER under the stale centroids than
  *     under the rebalanced ones.
  */
class IvfRebalanceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val K = 16
  private val Iters = 2

  private def corpus0: DataFrame = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(GraftFunctions.vec_dot(col("v"), col("v"))))
  }

  private def seedsOf(c: DataFrame): DataFrame =
    c.orderBy(col("vec_id")).limit(K)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))

  /** Driver-side nprobe-1 recall@10: mean over queries of
    * |probe top-10 ∩ brute top-10| / 10. Spec-only measurement —
    * collected arrays, exact cosine. */
  private def recall10(index: Array[(Long, Array[Double], Double, Long)],
      cents: Array[(Long, Array[Double], Double)],
      queries: Array[(Long, Array[Double], Double)]): Double = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val recalls = queries.map { case (_, qv, qn) =>
      val cell = cents.maxBy { case (cid, cv, cn) =>
        (dot(qv, cv) / (qn * cn), -cid)
      }._1
      def top10(rows: Array[(Long, Array[Double], Double, Long)]) =
        rows.map { case (id, v, n, _) => (id, dot(qv, v) / (qn * n)) }
          .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val probe = top10(index.filter(_._4 == cell))
      val brute = top10(index)
      probe.intersect(brute).size.toDouble / 10.0
    }
    recalls.sum / recalls.length
  }

  private def collectIdx(df: DataFrame): Array[(Long, Array[Double], Double, Long)] =
    df.select(col("vec_id"), col("v"), col("nrm"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2),
        r.getLong(3)))

  private def collectCents(df: DataFrame): Array[(Long, Array[Double], Double)] =
    df.select(col("cid"), col("cv"), col("cnrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))

  test("rebalance == fresh build bit-identically; stale centroids lose recall on drifted data") {
    val c0 = corpus0
    val cents0 = IvfIndex.refine(c0, seedsOf(c0), Iters)
    val idx0 = IvfIndex.assignCells(c0, cents0)
    val counts0 = idx0.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))

    // heavy churn: delete every 17th survivor, fold in a DRIFTED
    // arrival population (reversed vectors — a distribution the old
    // quantizer never saw) under the PINNED old centroids
    val tomb = idx0.select(col("vec_id")).where(col("vec_id") % 17 === 3)
    val (afterDel, countsDel) = IvfIndex.deleteFromIndex(idx0, counts0, tomb)
    val fresh = c0.where(col("vec_id") < 400)
      .select((col("vec_id") + 20000000L).as("vec_id"),
        reverse(col("v")).as("v"), col("nrm"))
    val arrivals = IvfIndex.assignCells(fresh, cents0)
    val (churned, _) = IvfIndex.addToIndex(afterDel, countsDel, arrivals)

    // the verb under test
    val (cents2, rebuilt) = IvfIndex.rebalance(churned, K, Iters)

    // 1) bit-identical to a fresh build of the surviving corpus
    val freshBuild = IvfIndex.build(
      churned.select(col("vec_id"), col("v"), col("nrm")),
      seedsOf(churned.select(col("vec_id"), col("v"), col("nrm"))), Iters)
    assert(rebuilt.exceptAll(freshBuild).isEmpty &&
      freshBuild.exceptAll(rebuilt).isEmpty,
      "rebalance must equal a fresh build of the surviving corpus")

    // 2) recall: queries drawn from the DRIFTED population
    val idxArr = collectIdx(churned)
    val rebArr = collectIdx(rebuilt)
    val queries = idxArr.filter(_._1 >= 20000000L).sortBy(_._1).take(48)
      .map { case (id, v, n, _) => (id, v, n) }
    val pre = recall10(idxArr, collectCents(cents0), queries)
    val post = recall10(rebArr, collectCents(cents2), queries)
    // the fresh-build pin: rebalance IS the fresh build (asserted
    // bit-identical above), so its recall IS the fresh-build recall —
    // measure it independently anyway so the pin is empirical, not
    // circular
    val freshRecall = recall10(collectIdx(freshBuild),
      collectCents(IvfIndex.refine(
        churned.select(col("vec_id"), col("v"), col("nrm")),
        seedsOf(churned.select(col("vec_id"), col("v"), col("nrm"))),
        Iters)), queries)
    info(f"nprobe-1 recall@10: stale=$pre%.3f rebalanced=$post%.3f fresh=$freshRecall%.3f")
    assert(post > pre,
      f"rebalance must restore recall (stale=$pre%.3f, rebalanced=$post%.3f)")
    assert(post == freshRecall,
      f"rebalanced recall ($post%.3f) must equal the fresh-build pin ($freshRecall%.3f)")
  }
}
