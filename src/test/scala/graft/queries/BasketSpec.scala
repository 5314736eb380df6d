package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Invariants + plan pin for the q228 market-basket gate (values are
  * pinned by the oracle). */
class BasketSpec extends SparkTestBase {

  test("q228: pair support bounded by item supports; ordered pairs; no cartesian") {
    val df = graft.SparkEntry.queries("q228_basket_assoc")(spark, sf0001)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // recompute item supports independently
    val b = graft.sources.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val supp = b.groupBy(col("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (pa, pb, nab, bp) =>
      assert(pa < pb, s"pair ($pa,$pb) not id-ordered")
      assert(nab >= 1 && nab <= math.min(supp(pa), supp(pb)),
        s"pair ($pa,$pb): support $nab vs items ${supp(pa)}/${supp(pb)}")
      assert(bp > 0, s"pair ($pa,$pb) lift $bp")
    }
    // emitted in (support desc) order
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q228: hand-built baskets produce the textbook supports and lifts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("basket").toString
    // orders: {1,2}, {1,2}, {1,3}, {2} -> n_orders=4
    // n(1)=3 n(2)=3 n(3)=1; n(1,2)=2 n(1,3)=1
    // lift(1,2) = 2*4/(3*3) = 8/9 -> 8888 bp; lift(1,3) = 1*4/(3*1) -> 13333 bp
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 3L),
      (13L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q228_basket_assoc")(spark, dir)
      .collect().map(r =>
        ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got((1L, 2L)) == ((2L, 8888L)), got.toString)
    assert(got((1L, 3L)) == ((1L, 13333L)), got.toString)
    assert(got.size == 2, got.toString)
  }
}
