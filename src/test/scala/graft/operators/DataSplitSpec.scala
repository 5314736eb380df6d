package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class DataSplitSpec extends SparkTestBase {
  import spark.implicits._

  test("an id's fold depends only on (seed, id), not on the corpus") {
    val full = (1L to 1000L).toDF("id")
    val subset = full.where(col("id") % 7 === 0)
    val f1 = DataSplit.withFold(full, "id", "s").where(col("id") % 7 === 0)
      .select("id", "fold").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val f2 = DataSplit.withFold(subset, "id", "s")
      .select("id", "fold").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f1 == f2, "a smaller corpus must not reassign any id")
  }

  test("fold fractions land near the requested 80/10/10") {
    val folds = DataSplit.withFold((1L to 20000L).toDF("id"), "id", "s")
      .groupBy("fold").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(folds("train") - 16000L) < 500, folds.toString)
    assert(math.abs(folds("val") - 2000L) < 250, folds.toString)
    assert(math.abs(folds("test") - 2000L) < 250, folds.toString)
  }

  test("different seeds give different assignments") {
    val df = (1L to 500L).toDF("id")
    val a = DataSplit.withFold(df, "id", "seedA").where(col("fold") === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = DataSplit.withFold(df, "id", "seedB").where(col("fold") === "train")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("the split is a map-only plan: no exchange, stays in codegen") {
    // a parquet-backed frame, not a local Seq (Catalyst folds local
    // relations into a LocalTableScan, hiding the plan under test)
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val plan = DataSplit.withFold(docs, "doc_id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // "*(1)" marks the whole-stage-codegen'd stage in this rendering
    assert(plan.contains("*(1) Project"), plan)
  }

  test("misordered fold bounds are rejected") {
    intercept[IllegalArgumentException] {
      DataSplit.foldOf(col("id"), "s", Seq(("a", 9000), ("b", 8000)), "c")
    }
  }
}
