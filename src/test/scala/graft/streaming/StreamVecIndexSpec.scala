package graft.streaming

import graft.SparkTestBase
import graft.functions.GraftFunctions
import graft.operators.IvfIndex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming maintenance of the cell-keyed VECTOR index — q298's
  * incremental-add verb under Structured Streaming (the StreamIndexSpec
  * discipline applied to the ANN artifact): each micro-batch of
  * arriving vectors assigns against the FIXED centroids and folds into
  * the accumulated index via [[IvfIndex.addToIndex]], with per-cell
  * counts healing per batch. Batch boundaries must be invisible: after
  * N batches the index AND its stats equal a from-scratch assignment
  * of everything ingested. In production the accumulated side is the
  * persisted artifact (IndexStore read -> add -> atomic swap per
  * batch); here a localCheckpoint'ed frame isolates the fold chain. */
class StreamVecIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("per-batch vector adds under foreachBatch equal a full re-assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftFunctions.register(spark)

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(GraftFunctions.vec_dot(col("v"), col("v"))))
    val seeds = corpus.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    // the quantizer trains ONCE, on the seed slice — arrivals never
    // retrain it (the q298 production contract)
    val cents = IvfIndex.refine(corpus.where(col("vec_id") < 100), seeds, 1)
      .localCheckpoint()

    val seed = corpus.where(col("vec_id") < 100)
    var accIdx = IvfIndex.assignCells(seed, cents)
      .select(col("vec_id"), col("cid"), col("nrm")).localCheckpoint()
    var accCounts = accIdx.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs")).localCheckpoint()

    val rest = corpus.where(col("vec_id") >= 100)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect().toSeq
    var batches = 0
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = mem.toDF().toDF("vec_id", "v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val fresh = batch
            .select(col("vec_id"), col("v").cast("array<double>").as("v"))
            .withColumn("nrm",
              sqrt(GraftFunctions.vec_dot(col("v"), col("v"))))
          val additions = IvfIndex.assignCells(fresh, cents)
            .select(col("vec_id"), col("cid"), col("nrm"))
          val (idx, counts) =
            IvfIndex.addToIndex(accIdx, accCounts, additions)
          accIdx = idx.localCheckpoint()
          accCounts = counts.localCheckpoint()
          batches += 1
        }
      }
      .start()
    mem.addData(rest.filter(_._1 % 3 == 0): _*)
    q.processAllAvailable()
    mem.addData(rest.filter(_._1 % 3 == 1): _*)
    q.processAllAvailable()
    mem.addData(rest.filter(_._1 % 3 == 2): _*)
    q.processAllAvailable()
    q.stop()
    assert(batches >= 3, s"expected >=3 non-empty micro-batches, got $batches")

    val full = IvfIndex.assignCells(corpus, cents)
      .select(col("vec_id"), col("cid"), col("nrm"))
    assert(accIdx.except(full).count() == 0 &&
      full.except(accIdx).count() == 0,
      "streamed index diverged from the from-scratch assignment")
    val recount = full.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    assert(accCounts.except(recount).count() == 0 &&
      recount.except(accCounts).count() == 0,
      "streamed per-cell stats diverged from a recount")
  }
}
