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

  test("q290 delete: index-after-delete == rebuild over retained, untouched blocks byte-identical") {
    import graft.operators.Bm25
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val block = 64
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val full = Bm25.buildIndex(docs, "doc_id", "t", block)
    val scal = Bm25.corpusScalars(docs, "doc_id", "t")
    val tomb = docs.where(col("doc_id") % 7 === 0).select(col("doc_id"))
    val (del, delScal) = Bm25.deleteFromIndex(full, scal, tomb, block)
    // equality with a from-scratch build over the retained corpus
    val retained = docs.where(col("doc_id") % 7 =!= 0)
    val rebuilt = Bm25.buildIndex(retained, "doc_id", "t", block)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("term", "block", "n_docs", "sum_tf", "postings")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
    assert(rows(del) == rows(rebuilt))
    val rs = Bm25.corpusScalars(retained, "doc_id", "t").collect().head
    val ds = delScal.collect().head
    assert(ds.getLong(0) == rs.getLong(0) && ds.getLong(1) == rs.getLong(1))
    // untouched blocks must pass through without a rewrite: every
    // block holding no tombstoned id keeps its exact postings string
    val tombBlocks = tomb.collect().map(_.getLong(0) / block).toSet
    val before = full.select("term", "block", "postings").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    del.select("term", "block", "postings").collect().foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      if (!tombBlocks.contains(r.getLong(1)))
        assert(r.getString(2) == before(key), s"untouched block rewrote: $key")
    }
  }
}
