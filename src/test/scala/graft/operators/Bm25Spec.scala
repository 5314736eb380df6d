package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private def tokenized(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))

  test("scores match the hand-computed odds-idf BM25 on a tiny corpus") {
    // corpus: N=3, avgdl = (4+2+3)/3 = 3.0
    val docs = tokenized(
      1L -> "cat dog cat fish",   // dl=4, tf(cat)=2
      2L -> "dog dog",            // dl=2
      3L -> "bird bird bird")     // dl=3
    val got = Bm25.search(docs, "doc_id", "t", Seq("cat"), 10)
      .as[(Long, Double)].collect()
    // only doc 1 contains "cat": df=1, idf=(3-1+0.5)/(1+0.5)=5/3
    // norm = 2 + 1.2*(0.25 + 0.75*4/3.0) = 3.5; s = (5/3)*(2*2.2)/3.5
    val expected = ((3 - 1 + 0.5) / 1.5) * (2 * 2.2) /
      (2 + 1.2 * (0.25 + 0.75 * 4 / 3.0))
    assert(got.toSeq == Seq(1L -> expected))
  }

  test("per-document score is the fixed-order sum over matched terms") {
    val docs = tokenized(1L -> "cat dog", 2L -> "cat cat", 3L -> "emu emu")
    val both = Bm25.search(docs, "doc_id", "t", Seq("cat", "dog"), 10)
      .as[(Long, Double)].collect().toMap
    val catOnly = Bm25.search(docs, "doc_id", "t", Seq("cat"), 10)
      .as[(Long, Double)].collect().toMap
    val dogOnly = Bm25.search(docs, "doc_id", "t", Seq("dog"), 10)
      .as[(Long, Double)].collect().toMap
    // doc 1 matches both terms; its two-term score is exactly the sum
    assert(both(1L) == catOnly(1L) + dogOnly(1L))
    // doc 2 matches only "cat"; adding an unmatched term changes nothing
    assert(both(2L) == catOnly(2L))
    // doc 3 matches neither term and is absent everywhere
    assert(!both.contains(3L) && !catOnly.contains(3L))
  }

  test("k bounds the result and the cut is score-then-id deterministic") {
    val docs = tokenized((1L to 8L).map(i => i -> "cat"): _*)
    // all 8 docs tie exactly -> the 3 lowest ids must win
    val got = Bm25.search(docs, "doc_id", "t", Seq("cat"), 3)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("plan: top-k heap, broadcast stats, no cartesian on the data side") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val plan = Bm25.search(docs, "doc_id", "t",
      Seq("spark", "vector"), 20).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // the only nested-loop join is the 1-row corpus-scalars attach
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("empty and duplicate query term lists are rejected") {
    val docs = tokenized(1L -> "cat")
    intercept[IllegalArgumentException](
      Bm25.search(docs, "doc_id", "t", Nil, 5))
    intercept[IllegalArgumentException](
      Bm25.search(docs, "doc_id", "t", Seq("cat", "cat"), 5))
    intercept[IllegalArgumentException](
      Bm25.searchIndex(docs.limit(0), docs.limit(0), Nil, 5))
  }

  // ---- persisted-index lifecycle ---------------------------------------

  private def corpus = graft.sources.Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), split(col("text"), " ").as("t"))

  test("index-served scores are bit-identical to the corpus path") {
    val idx = Bm25.buildIndex(corpus, "doc_id", "t", 100)
    val scal = Bm25.corpusScalars(corpus, "doc_id", "t")
    val terms = Seq("spark", "vector", "stream", "window")
    val direct = Bm25.search(corpus, "doc_id", "t", terms, 20)
      .as[(Long, Double)].collect().toSeq
    val served = Bm25.searchIndex(idx, scal, terms, 20)
      .as[(Long, Double)].collect().toSeq
    // exact Double equality — both paths run the same Column tail
    assert(served == direct)
  }

  test("buildIndex blocks bound state and keep entries doc-sorted") {
    val docs = tokenized((0L to 9L).map(i => i -> "cat cat dog"): _*)
    val rows = Bm25.buildIndex(docs, "doc_id", "t", 4)
      .where(col("term") === "cat")
      .as[(String, Long, Long, Long, String)].collect()
      .sortBy(_._2)
    // ids 0-9 with block 4 -> blocks 0,1,2 of sizes 4,4,2
    assert(rows.map(r => (r._2, r._3)).toSeq == Seq((0L, 4L), (1L, 4L), (2L, 2L)))
    // entries sorted by doc id, each doc:tf:dl with tf=2, dl=3
    assert(rows.head._5 == "0:2:3,1:2:3,2:2:3,3:2:3")
    assert(rows.last._5 == "8:2:3,9:2:3")
    assert(rows.map(_._4).toSeq == Seq(8L, 8L, 4L)) // sum_tf per block
  }

  test("mergeIndex of disjoint batches equals a full rebuild") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val base = Bm25.buildIndex(corpus.where(col("doc_id") % 5 =!= 0), "doc_id", "t", 100)
    val delta = Bm25.buildIndex(corpus.where(col("doc_id") % 5 === 0), "doc_id", "t", 100)
    val merged = canon(Bm25.mergeIndex(base, delta))
    val full = canon(Bm25.buildIndex(corpus, "doc_id", "t", 100))
    assert(merged == full)
    // a term entirely absent from one side still round-trips: merge
    // against an EMPTY delta is the identity
    val empty = Bm25.buildIndex(corpus.where(lit(false)), "doc_id", "t", 100)
    assert(canon(Bm25.mergeIndex(base, empty)) == canon(base))
  }

  test("varintBytes matches the LEB128 reference length, 0 included") {
    def ref(x: Long): Long = {
      var v = x; var n = 1L
      while (v > 127) { v >>>= 7; n += 1 }
      n
    }
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 2097151L, 2097152L,
      Int.MaxValue.toLong, Long.MaxValue)
    val got = vals.toDF("x").select(Bm25.varintBytes(col("x")))
      .as[Long].collect().toSeq
    assert(got == vals.map(ref))
  }

  test("serve plan prunes the artifact scan by term and never reads the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    Bm25.buildIndex(corpus, "doc_id", "t", 100)
      .write.mode("overwrite").parquet(dir)
    val scal = Bm25.corpusScalars(corpus, "doc_id", "t")
    val plan = Bm25.searchIndex(spark.read.parquet(dir), scal,
      Seq("spark", "vector"), 20).queryExecution.executedPlan.toString
    // the term IN (...) filter reaches the parquet scan of the artifact
    assert(plan.contains("PushedFilters: [In(term, [spark,vector])"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // postings come from the artifact only — documents.parquet appears
    // solely under the 1-row scalars subtree, never as a postings scan
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.exists(_.contains(dir.split('/').last)), plan)
  }
}
