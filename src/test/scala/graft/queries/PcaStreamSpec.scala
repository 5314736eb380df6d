package graft.queries

import graft.SparkTestBase
import graft.functions.GraftFunctions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The PCA scatter state accumulates AT INGEST: `gram_sums` is a
  * mergeable TypedImperativeAggregate (element-wise-added longs), so a
  * streaming complete-mode aggregation maintains the exact scatter
  * array across micro-batches — the same proven path as the AMS/PSI
  * sketches (SketchGateSpec / AuditStreamSpec). q276 already pins that
  * PCA over a merged array == batch PCA to the byte, so streamed
  * scatter + the 1-row iteration chain = PCA maintained at ingest with
  * no second corpus pass.
  */
class PcaStreamSpec extends SparkTestBase {

  test("streamed gram_sums state == batch scatter array, micro-batch boundaries invisible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GraftFunctions.register(spark)

    val rnd = new scala.util.Random(31)
    val rows = (0 until 60).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }
    def quant(df: org.apache.spark.sql.DataFrame) =
      df.select(expr("transform(CAST(embedding AS array<double>), x -> " +
        "CAST(floor(x*100.0 + 0.5) AS BIGINT))").as("qv"))

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = quant(mem.toDF().toDF("vec_id", "embedding"))
      .agg(GraftFunctions.gram_sums(col("qv"), 64).as("gs"))
      .writeStream.format("memory").queryName("gram_stream")
      .outputMode("complete").start()
    mem.addData(rows.take(25): _*)
    q.processAllAvailable()
    val mid = spark.table("gram_stream").collect().head.getSeq[Long](0)
    mem.addData(rows.drop(25): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gram_stream").collect().head.getSeq[Long](0)

    val batch = quant(rows.toDF("vec_id", "embedding"))
      .agg(GraftFunctions.gram_sums(col("qv"), 64).as("gs"))
      .collect().head.getSeq[Long](0)
    assert(streamed.length == 1 + 64 + 64 * 65 / 2)
    assert(streamed == batch, "streamed scatter must equal the batch scatter")
    // the mid-stream state was the exact scatter of the first 25 rows
    val firstBatch = quant(rows.take(25).toDF("vec_id", "embedding"))
      .agg(GraftFunctions.gram_sums(col("qv"), 64).as("gs"))
      .collect().head.getSeq[Long](0)
    assert(mid == firstBatch)
    assert(streamed.head == 60L && mid.head == 25L, "row counts ride in cell 0")
  }
}
