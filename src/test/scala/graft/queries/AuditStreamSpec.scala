package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins for the audit family (the q226-AMS discipline):
  * both q247 PSI and q248 Gini read states that are plain mergeable
  * aggregates — the PSI drift grids are per-(slice, bucket) sketch
  * cells, the Gini input is the per-user purchase total — so the
  * state accumulates AT INGEST as a streaming aggregation, and the
  * statistic computed off the streamed state must equal the batch
  * one. Both sides of each test share the gate's own expressions
  * (the registered quantile_sketch aggregate, the cents rollup), so
  * the property is purely "streaming accumulation == batch". */
class AuditStreamSpec extends SparkTestBase {

  import spark.implicits._

  test("q247 streaming: drift grids accumulate across micro-batches; PSI off the streamed grid == batch") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val b1 = (0 until 40).map(i => (i.toLong, 50L + 7L * (i % 11)))
    val b2 = (40 until 90).map(i => (i.toLong, 30L + 13L * (i % 17)))
    def cells(df: DataFrame): DataFrame = df
      .select((col("doc_id") % 2).as("half"), col("n_chars").as("v"))
      .groupBy(col("half"))
      .agg(graft.functions.GraftFunctions
        .quantile_sketch(col("v"), TextQueries.QsBits).as("sk"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = cells(mem.toDF().toDF("doc_id", "n_chars"))
      .writeStream.format("memory").queryName("psi_grid_stream")
      .outputMode("complete").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()

    def explodeCells(df: DataFrame) = df
      .select(col("half"), explode(col("sk")).as(Seq("bucket", "cnt")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = explodeCells(spark.table("psi_grid_stream"))
    val batch = explodeCells(cells((b1 ++ b2).toDF("doc_id", "n_chars")))
    assert(streamed.nonEmpty && streamed == batch,
      s"grids diverge: ${streamed.toSeq.diff(batch.toSeq)}")

    // the statistic is a pure function of the grid, so equal grids =>
    // equal PSI; compute it anyway off both to pin the full chain
    def psi(cells: Map[(Long, Long), Long]): Long = {
      val tot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val bp = cells.map { case ((h, b), c) => (h, b) -> c * 10000L / tot(h) }
      val buckets = bp.keySet.map(_._2)
      buckets.toSeq.flatMap { b =>
        for {
          p <- bp.get((0L, b)); q <- bp.get((1L, b)) if p > 0 && q > 0
        } yield (p - q) * math.floor(math.log(p.toDouble / q) * 1e6 + 0.5).toLong
      }.sum
    }
    assert(psi(streamed) == psi(batch))
  }

  test("q248 streaming: per-user totals accumulate across micro-batches; Gini off the streamed frame == batch") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq((1L, 100L), (2L, 250L), (1L, 50L), (3L, 10L))
    val b2 = Seq((2L, 300L), (4L, 999L), (1L, 1L), (5L, 40L), (3L, 90L))
    def totals(df: DataFrame): DataFrame = df
      .groupBy(col("user_id")).agg(sum(col("c")).as("x"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = totals(mem.toDF().toDF("user_id", "c"))
      .writeStream.format("memory").queryName("gini_user_stream")
      .outputMode("complete").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()

    def frame(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = frame(spark.table("gini_user_stream"))
    val batch = frame(totals((b1 ++ b2).toDF("user_id", "c")))
    assert(streamed == batch)

    // q248's exact integer Gini off the per-user frame
    def gini(users: Map[Long, Long]): Long = {
      val xs = users.toSeq.sortBy(t => (t._2, t._1)).map(_._2)
      val n = xs.length.toLong
      val tx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      java.math.BigInteger.valueOf(10000L * (2 * six - (n + 1) * tx))
        .divide(java.math.BigInteger.valueOf(n * tx)).longValue()
    }
    assert(gini(streamed) == gini(batch))
    assert(gini(streamed) > 0) // the fixture is genuinely unequal
  }

  test("q279 streaming: calibration bin partials accumulate at ingest; Brier off the streamed bins == batch") {
    implicit val sqlCtx = spark.sqlContext
    // per-doc (text, n_chars) batches with tokens whose md5 weights
    // spread the scores across bins
    val b1 = (0 until 30).map(i => (s"tok$i alpha ${i % 7}", 200L + 20L * i))
    val b2 = (30 until 80).map(i => (s"beta$i ${i % 5} gamma", 100L + 9L * i))
    // the gate's own expressions: md5 token weight -> clamped p_bp ->
    // bin -> (n, n_pos, sp, sq) partials
    def bins(df: DataFrame): DataFrame = {
      val weight = (t: org.apache.spark.sql.Column) =>
        conv(substring(md5(concat(lit("w:"), t)), 1, 7), 16, 10)
          .cast("long") % 10000 - 5000
      df.select((col("n_chars") >= 300).as("pos"),
          aggregate(transform(split(col("text"), " "), weight),
            lit(0L), (a, x) => a + x).as("score"))
        .select(col("pos"),
          expr("greatest(0L, least(159999L, score + 80000L)) DIV 16").as("p_bp"))
        .select(expr("p_bp DIV 1000").as("bin"), col("pos"), col("p_bp"),
          expr("p_bp - IF(pos, 10000L, 0L)").as("err"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(col("p_bp")).as("sp"), sum(col("err") * col("err")).as("sq"))
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = bins(mem.toDF().toDF("text", "n_chars"))
      .writeStream.format("memory").queryName("brier_bin_stream")
      .outputMode("complete").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable(); q.stop()

    def frame(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val streamed = frame(spark.table("brier_bin_stream"))
    val batch = frame(bins((b1 ++ b2).toDF("text", "n_chars")))
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.size > 1, "fixture should populate multiple bins")

    // the q279 output columns are pure functions of the partials
    def brier(bins: Map[Long, (Long, Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val (n, _, _, sq) = bins.values
        .foldLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), (w, x, y, z)) =>
          (a + w, b + x, c + y, d + z)
        }
      bins.toSeq.sortBy(_._1).map { case (bin, (bn, bp, bsp, bsq)) =>
        (bin, bsp / bn, 10000L * bp / bn, bsq / bn)
      } :+ (-1L, n, n, sq / n)
    }
    assert(brier(streamed) == brier(batch))
  }
}
