package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkTestBase {

  test("exact dedup collapses planted duplicates to the lowest doc_id") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma"),
      (11L, "alpha beta gamma"),   // dup of 10
      (12L, "delta epsilon"),
      (13L, "alpha beta gamma"),   // dup of 10
      (14L, "delta epsilon"),      // dup of 12
      (15L, "zeta")
    ).toDF("doc_id", "text").repartition(3)

    val out = docs
      .groupBy(sha2(col("text"), 256).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))

    assert(out.toSeq == Seq((10L, 3L), (12L, 2L), (15L, 1L)))
  }

  test("dedup plan is partial+final hash agg on the fingerprint (no raw-text shuffle key)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = docs
      .groupBy(sha2(col("text"), 256).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"))
      .queryExecution.executedPlan.toString
    // two HashAggregates (partial, final) around one shuffle on the hash
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    // the exchange partitions on the computed fingerprint expression
    // (Catalyst names it _groupingexpression), never on the raw text
    val exchange = plan.linesIterator.find(_.contains("Exchange hashpartitioning")).get
    assert(exchange.contains("_groupingexpression") || exchange.contains("fp#"), exchange)
    assert(!exchange.contains("text#"), exchange)
  }

  test("token/stopword counts match a hand computation") {
    import spark.implicits._
    val df = Seq("the cat sat on the mat", "a a a b").toDF("text")
    val stopArr = array(Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for").map(lit): _*)
    val rows = df.select(
      size(split(col("text"), " ")).as("n_tok"),
      size(filter(split(col("text"), " "), t => array_contains(stopArr, t))).as("n_stop"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((6, 2), (4, 3)))
  }

  test("rolling fingerprint is order-sensitive, content hash is not") {
    import spark.implicits._
    val df = Seq("alpha beta", "beta alpha").toDF("text")
    def rollFp = aggregate(
      zip_with(split(col("text"), " "), sequence(lit(1), size(split(col("text"), " "))),
        (t, i) => i.cast("long") * conv(substring(md5(t), 1, 7), 16, 10).cast("long")),
      lit(0L), (acc, h) => acc + h)
    val fps = df.select(rollFp.as("r")).collect().map(_.getLong(0))
    assert(fps(0) != fps(1), "position weighting must distinguish token order")
  }
}
