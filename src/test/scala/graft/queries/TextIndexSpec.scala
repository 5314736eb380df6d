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

  test("q149: bigram/unigram aggs partial-aggregate; scalars broadcast; top-50 heap") {
    val plan = planOf("q149_phrase_mining")
    assert("partial_".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q149: bigrams never cross document boundaries") {
    // two docs that would mint the bigram (b, c) only if windows
    // leaked across the boundary
    import spark.implicits._
    val d = Seq("a b", "c d").toDF("l0")
      .select(split(col("l0"), " ").as("l"))
    val bg = d.select(explode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2")).as[(String, String)].collect().toSet
    assert(bg == Set("a" -> "b", "c" -> "d"))
  }

  test("q150: every stage scan pushes its event_type to parquet") {
    val plan = graft.SparkEntry.queries("q150_event_funnel")(spark, sf0001)
      .queryExecution.executedPlan.toString
    for (t <- Seq("signup", "click", "purchase"))
      assert(plan.contains(s"EqualTo(event_type,$t)"), s"missing pushdown for $t")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q157: vocab broadcast-joins, top-V heap, ids consistent with n_unk") {
    val got = graft.SparkEntry.queries("q157_vocab_encode")(spark, sf0001)
    val plan = got.queryExecution.executedPlan.toString
    // vocab side reaches the encode join as a broadcast; the top-V cut
    // is a heap, not a global sort of the vocabulary
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val rows = got.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val ids = r.getString(3).split(',').map(_.toLong)
      assert(ids.length == r.getLong(1), "n_tok != id count")
      assert(ids.count(_ == 0L) == r.getLong(2), "n_unk != zero count")
      assert(ids.forall(i => i >= 0 && i <= 256), "id out of vocab range")
    }
  }

  test("q150: stage times are strictly ordered and inside the window") {
    val rows = graft.SparkEntry.queries("q150_event_funnel")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val win = 7L * 24 * 3600 * 1000 * 1000
    rows.foreach { r =>
      val ta = r.getLong(1)
      if (!r.isNullAt(2)) {
        assert(r.getLong(2) > ta && r.getLong(2) <= ta + win)
        if (!r.isNullAt(3))
          assert(r.getLong(3) > r.getLong(2) && r.getLong(3) <= ta + win)
      } else assert(r.isNullAt(3), "stage 3 reached without stage 2")
    }
  }
}
