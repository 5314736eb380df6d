package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Semantics and plan pins for the exact lexical-similarity family
  * (q182 sparse sim join, q186 containment join): directionality,
  * the df-cap candidate guard, and equi-join-only plan shapes. */
class TextSimSpec extends SparkTestBase {

  import spark.implicits._

  private def run(name: String, rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("textsim").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries(name)(spark, dir)
  }

  test("containment is directional: the quoted short doc scores 100%") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val got = run("q186_containment_join",
      Seq((1L, quote), (2L, s"$filler $quote")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toList
    // short doc 1 fully contained in 2 (10000 bp); 2 NOT >=50% in 1
    assert(got == List((1L, 2L, 10000L)))
  }

  test("df cap: shingles shared by >10 docs generate no candidates") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = (1L to 12L).map(i => (i, boiler))
    assert(run("q186_containment_join", docs).count() == 0)
    assert(run("q182_sparse_sim_join", docs).count() == 0)
  }

  test("sparse sim and containment plans are equi-join only") {
    Seq("q182_sparse_sim_join", "q186_containment_join").foreach { name =>
      val plan = graft.SparkEntry
        .queries(name)(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), name)
      assert(!plan.contains("BroadcastNestedLoopJoin") ||
        name == "q182_sparse_sim_join", name) // q182 broadcasts the 1-row n_docs scalar
    }
  }

  test("q209: window pairs from one Generate; no position self-join") {
    val df = graft.SparkEntry.queries("q209_skipgram_pairs")(spark, sf0001)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 50)
    // pairs are directional within a symmetric window: for surviving
    // high-count pairs the reverse direction should also be sampled
    // somewhere in the corpus (not necessarily kept — just sanity on
    // the window form), and counts are positive descending
    assert(rows.forall(_._3 > 0))
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the pair build is a single per-row explode (plus the freq-table
    // token explode); the only join is the vocab-keyed rate join
    assert("Generate explode".r.findAllIn(plan).size <= 2, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }
}
