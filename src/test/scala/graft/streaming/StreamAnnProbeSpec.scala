package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.queries.SimilarityQueries
import graft.sources.Tables

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamAnnProbeSpec extends SparkTestBase {

  private def fixtureQueries: Seq[(Long, Seq[Float])] = {
    import spark.implicits._
    Tables.load(spark, sf0001, "embeddings")
      .where(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
  }

  test("two-batch streamed probe equals the batch IVF-PQ search exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_ann_store").toString
    val ckpt = Files.createTempDirectory("graft_ann_ckpt").toString

    val qs = fixtureQueries
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamAnnProbe.startProbe(
      mem.toDF().toDF("vec_id", "embedding"), sf0001, store, ckpt)
    mem.addData(qs.take(2): _*)
    q.processAllAvailable()
    mem.addData(qs.drop(2): _*)
    q.processAllAvailable(); q.stop()

    val streamed = StreamAnnProbe.storeResults(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val batch = SimilarityQueries.ivfPqTopK(spark, sf0001)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
      .orderBy(col("qid"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    assert(batch.length == 50, s"expected 5 queries x top-10, got ${batch.length}")
    assert(streamed.toSeq == batch.toSeq,
      "streamed probe rows must equal the batch search byte-for-byte")
  }

  test("a replayed probe batch overwrites its partition instead of duplicating") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_ann_store2").toString
    val qs = fixtureQueries

    val mem = MemoryStream[(Long, Seq[Float])]
    val c1 = Files.createTempDirectory("graft_ann_ckpt_a").toString
    val q1 = StreamAnnProbe.startProbe(
      mem.toDF().toDF("vec_id", "embedding"), sf0001, store, c1)
    mem.addData(qs.take(3): _*)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(store).count()

    val mem2 = MemoryStream[(Long, Seq[Float])]
    val c2 = Files.createTempDirectory("graft_ann_ckpt_b").toString
    val q2 = StreamAnnProbe.startProbe(
      mem2.toDF().toDF("vec_id", "embedding"), sf0001, store, c2)
    mem2.addData(qs.take(3): _*)
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(store).count()

    assert(n1 == n2, s"replayed probe batch must be idempotent: $n1 -> $n2")
  }
}
