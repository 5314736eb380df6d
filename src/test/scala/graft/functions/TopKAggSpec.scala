package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkTestBase {

  test("max_k returns the k largest values descending, across partitionings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vals = scala.util.Random.shuffle((1 to 1000).map(_.toDouble)).toList
    for (p <- Seq(1, 4, 8)) {
      val arr = vals.toDF("x").repartition(p)
        .agg(GraftFunctions.max_k(col("x"), 5).as("s"))
        .collect()(0).getSeq[Double](0)
      assert(arr == Seq(1000.0, 999.0, 998.0, 997.0, 996.0), s"partitions=$p")
    }
  }

  test("min_k mirrors max_k; typed over strings; nulls skipped; empty -> NULL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val arr = Seq("pear", "apple", "quince", "fig").toDF("x")
      .agg(GraftFunctions.min_k(col("x"), 2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(arr == Seq("apple", "fig"))

    val withNulls = Seq[java.lang.Double](3.0, null, 1.0, null, 2.0).toDF("x")
      .agg(GraftFunctions.max_k(col("x"), 2).as("s"))
      .collect()(0).getSeq[Double](0)
    assert(withNulls == Seq(3.0, 2.0))

    val empty = Seq[java.lang.Double](null, null).toDF("x")
      .agg(GraftFunctions.max_k(col("x"), 3).as("s")).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("plan is partial ObjectHashAggregate -> exchange -> final (no per-group sort of all rows)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (1 to 100).map(i => (i % 5, i.toDouble)).toDF("g", "x").repartition(4)
    val plan = df.groupBy(col("g")).agg(GraftFunctions.max_k(col("x"), 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
