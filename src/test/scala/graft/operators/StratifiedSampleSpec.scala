package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class StratifiedSampleSpec extends SparkTestBase {
  import spark.implicits._

  private def df = (1L to 20000L).toDF("id")
    .withColumn("s", when(col("id") % 2 === 0, "a").otherwise("b"))

  test("a row's keep/drop depends only on (seed, id), not on the corpus") {
    val full = StratifiedSample
      .sampleBy(df, "id", "s", Map("a" -> 3000), 10000, "sd")
      .where(col("id") <= 5000).select("id").collect().map(_.getLong(0)).toSet
    val sub = StratifiedSample
      .sampleBy(df.where(col("id") <= 5000), "id", "s", Map("a" -> 3000), 10000, "sd")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(full == sub, "a smaller corpus must not flip any decision")
  }

  test("per-stratum rates land near the requested basis points") {
    val kept = StratifiedSample
      .sampleBy(df, "id", "s", Map("a" -> 2500, "b" -> 7500), 10000, "sd")
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("a") - 2500L) < 250, kept.toString) // of 10000 'a' rows
    assert(math.abs(kept("b") - 7500L) < 250, kept.toString)
  }

  test("an unmapped stratum uses the default rate") {
    val kept = StratifiedSample
      .sampleBy(df, "id", "s", Map("a" -> 0), defaultBp = 10000, seed = "sd")
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("a") && kept("b") == 10000L, kept.toString)
  }

  test("sampling is a map-only plan: no exchange") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val plan = StratifiedSample
      .sampleBy(docs, "doc_id", "lang", Map("en" -> 2500), 10000, "sd")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("rates outside basis-point range are rejected") {
    intercept[IllegalArgumentException] {
      StratifiedSample.sampleBy(df, "id", "s", Map("a" -> 10001), 10000, "sd")
    }
    intercept[IllegalArgumentException] {
      StratifiedSample.sampleBy(df, "id", "s", Map.empty, -1, "sd")
    }
  }
}
