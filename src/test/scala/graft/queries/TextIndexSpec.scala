package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Plan-shape pins for the retrieval-side text gates (q142 inverted
  * index, q143 adaptive threshold) — the properties that keep them
  * viable at 100 TB. */
class TextIndexSpec extends SparkTestBase {

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q142: both index aggregations partial-aggregate before their exchange") {
    val plan = planOf("q142_inverted_index")
    // tf agg and block agg each split into partial_/merge_ halves —
    // map-side combine is what bounds the exchanges
    assert("partial_".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q142: posting blocks bound per-group state") {
    val rows = graft.SparkEntry.queries("q142_inverted_index")(spark, sf0001)
      .select(col("n_docs")).collect().map(_.getLong(0))
    assert(rows.nonEmpty && rows.forall(_ <= 100L),
      s"a posting block exceeded its 100-doc bound: max=${rows.max}")
  }

  test("q143: the sketch threshold broadcasts; the corpus is never sorted") {
    val plan = planOf("q143_adaptive_quality")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"), plan)
    // the only Sort belongs to the few-hundred-row sketch-cell window
    // and the final 5-row output, never the corpus scan side
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q143: the threshold really is the sketch-read median") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val kept = graft.SparkEntry.queries("q143_adaptive_quality")(spark, sf0001)
      .agg(sum(col("n_kept"))).as[Long].head()
    val n = docs.count()
    // sketch guarantees 2^-5 relative rank error around P50: the kept
    // fraction must land near half the corpus
    assert(kept >= n * 35 / 100 && kept <= n * 65 / 100, s"kept=$kept of $n")
  }
}
