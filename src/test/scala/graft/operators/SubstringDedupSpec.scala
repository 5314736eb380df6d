package graft.operators

import graft.SparkTestBase


import org.apache.spark.sql.functions._

/** Semantics + plan pins for exact substring dedup: first occurrence
  * wins, coverage merges overlaps, sub-k docs are untouched, and the
  * corpus-side reassembly join broadcasts the (small) start lists. */
class SubstringDedupSpec extends SparkTestBase {

  import spark.implicits._

  private val K = 3

  private def scrubbed(rows: (Long, String)*): Map[Long, (String, Long)] =
    SubstringDedup.scrub(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text", K)
      .select(col("doc_id"), col("kept_text"), col("n_kept"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("first occurrence keeps the span; later occurrence loses exactly it") {
    val m = scrubbed(
      1L -> "a b c d e",   // canonical "a b c", "b c d", "c d e"
      2L -> "x a b c d y", // shares "a b c" and "b c d" -> tokens 2..5 cut
      3L -> "p q r s t")   // untouched
    assert(m(1L) == (("a b c d e", 5L)))
    assert(m(2L) == (("x y", 2L)))
    assert(m(3L) == (("p q r s t", 5L)))
  }

  test("within-document repetition: the second copy is removed") {
    // "a b c" occurs at pos 1 and pos 4 of the SAME doc; pos 1 is
    // canonical, pos 4-6 are covered
    val m = scrubbed(7L -> "a b c a b c")
    assert(m(7L) == (("a b c", 3L)))
  }

  test("overlapping duplicated grams merge into one cut, no gaps") {
    // doc 2 shares the full 4-token span "a b c d" with doc 1: its two
    // overlapping 3-gram removals (pos 2, pos 3) must merge to cover
    // tokens 2..5 exactly once
    val m = scrubbed(1L -> "a b c d", 2L -> "z a b c d w")
    assert(m(1L) == (("a b c d", 4L)))
    assert(m(2L) == (("z w", 2L)))
  }

  test("a fully duplicated document scrubs to empty") {
    val m = scrubbed(1L -> "a b c d", 2L -> "a b c d")
    assert(m(1L) == (("a b c d", 4L)))
    assert(m(2L) == (("", 0L)))
  }

  test("docs shorter than k yield no grams and pass through") {
    val m = scrubbed(1L -> "a b", 2L -> "a b")
    assert(m(1L) == (("a b", 2L)) && m(2L) == (("a b", 2L)))
  }

  test("plan: reassembly join broadcasts; nothing goes cartesian") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val df = SubstringDedup.scrub(docs, "doc_id", "text", 10)
    df.collect()
    // toString renders through AQE's materialized stages, where
    // collect() on the adaptive wrapper would see no join nodes
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("gram-hash mode is result-identical on the fixture") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val exact = SubstringDedup.scrub(docs, "doc_id", "text", 10)
      .select("doc_id", "kept_text", "n_kept")
    val hashed = SubstringDedup.scrub(docs, "doc_id", "text", 10,
      hashGrams = true).select("doc_id", "kept_text", "n_kept")
    assert(exact.exceptAll(hashed).isEmpty && hashed.exceptAll(exact).isEmpty)
  }

  test("gram-hash mode: the exchange key is an 8-byte BIGINT, not text") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val occ = SubstringDedup
      .occurrences(docs, "doc_id", "text", 10, hashGrams = true)
    assert(occ.schema("g").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("gram-hash mode cuts shuffle-write bytes on the fixture") {
    import org.apache.spark.scheduler._
    // sum shuffle-write bytes across every stage of `body` — the bus
    // posts StageCompleted before the matching JobEnd, so once all
    // started jobs have ended the byte count is complete
    def shuffleBytes(body: => Unit): Long = {
      val bytes = new java.util.concurrent.atomic.AtomicLong(0)
      val started = new java.util.concurrent.atomic.AtomicInteger(0)
      val ended = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        override def onJobStart(j: SparkListenerJobStart): Unit =
          started.incrementAndGet()
        override def onJobEnd(j: SparkListenerJobEnd): Unit =
          ended.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        val deadline = System.currentTimeMillis + 30000
        while ((started.get == 0 || ended.get < started.get) &&
          System.currentTimeMillis < deadline) Thread.sleep(50)
        bytes.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val exactBytes = shuffleBytes(
      SubstringDedup.removalStarts(docs, "doc_id", "text", 10).count())
    val hashedBytes = shuffleBytes(
      SubstringDedup.removalStarts(docs, "doc_id", "text", 10,
        hashGrams = true).count())
    assert(exactBytes > 0 && hashedBytes > 0)
    assert(hashedBytes < (exactBytes * 7) / 10,
      s"hashed=$hashedBytes exact=$exactBytes")
  }
}
