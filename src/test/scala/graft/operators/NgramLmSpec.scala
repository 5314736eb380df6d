package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Semantics pins for the stupid-backoff trigram LM: exact padded
  * counts, the in-plan head-bigram recovery, each backoff level's
  * probability, and the micro-nat quantization. */
class NgramLmSpec extends SparkTestBase {

  import spark.implicits._

  private def modelOf(texts: String*) =
    NgramLm.train(texts.toDF("text"), "text")

  test("count tables match hand-derived values on a 2-doc corpus") {
    val m = modelOf("a b", "a b")
    // padded: <s> <s> a b </s> per doc
    val tri = m.tri.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(tri == Set(
      ("<s>", "<s>", "a", 2L), ("<s>", "a", "b", 2L), ("a", "b", "</s>", 2L)))
    val big = m.big.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // tail rollup + recovered (<s>,<s>) head — one per doc
    assert(big == Set(
      ("<s>", "<s>", 2L), ("<s>", "a", 2L), ("a", "b", 2L), ("b", "</s>", 2L)))
    val uni = m.uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // <s> appears twice per doc
    assert(uni == Map("<s>" -> 4L, "a" -> 2L, "b" -> 2L, "</s>" -> 2L))
    val Array(scal) = m.scal.collect()
    assert(scal.getLong(0) == 10L && scal.getLong(1) == 4L)
  }

  test("seen trigrams cost exactly -ln(tri/ctx) micro-nats") {
    // train: "a b" x2, "a c" — context (<s>,a) seen 3x, trigram
    // (<s>,a,b) 2x -> p3 = 2/3 for that position in "a b"
    val m = modelOf("a b", "a b", "a c")
    val scored = NgramLm.score(Seq((1L, "a b")).toDF("doc_id", "text"),
      "text", m, Seq("doc_id")).collect().head
    // positions: (<s>,<s>,a) p=3/3, (<s>,a,b) p=2/3, (a,b,</s>) p=2/2
    val expected = Seq(1.0, 2.0 / 3.0, 1.0)
      .map(p => math.round(-math.log(p) * NgramLm.CostScale)).sum
    assert(scored.getLong(1) == 3L) // n_tok
    assert(scored.getLong(2) == expected)
  }

  test("unseen trigram with seen bigram backs off once with alpha") {
    // train has bigram (b,c) via doc "b c" but never trigram (a,b,c)
    val m = modelOf("a b", "b c")
    val scored = NgramLm.score(Seq((1L, "a b c")).toDF("doc_id", "text"),
      "text", m, Seq("doc_id")).collect().head
    // position (a,b,c): tri unseen; big(b,c)=1, uni(b)=2 -> 0.4 * 1/2
    val pTri = Seq(
      1.0 / 2.0, // (<s>,<s>,a): tri 1 / big(<s>,<s>) 2 (both docs)
      1.0 / 1.0) // (<s>,a,b): tri 1 / big(<s>,a) 1
    val backed = 0.4 * (1.0 / 2.0)
    // (b,c,</s>): tri seen from "b c" -> 1 / big(b,c) 1
    val tail = 1.0
    val expected = (pTri ++ Seq(backed, tail))
      .map(p => math.round(-math.log(p) * NgramLm.CostScale)).sum
    assert(scored.getLong(2) == expected)
  }

  test("unseen unigram hits the alpha^2 add-one OOV floor") {
    val m = modelOf("a b")
    // "z" is OOV: total=5 (<s>:2,a:1,b:1,</s>:1 -> 2+1+1+1=5), v=4
    val scored = NgramLm.score(Seq((1L, "z")).toDF("doc_id", "text"),
      "text", m, Seq("doc_id")).collect().head
    val oov = 0.4 * 0.4 * (1.0 / (5 + 4 + 1))
    // (<s>,<s>,z) unseen at every level; (<s>,z,</s>) likewise except
    // </s> IS a seen unigram: p1 = (1+1)/(5+4+1)
    val eosFloor = 0.4 * 0.4 * (2.0 / 10.0)
    val expected = Seq(oov, eosFloor)
      .map(p => math.round(-math.log(p) * NgramLm.CostScale)).sum
    assert(scored.getLong(1) == 2L)
    assert(scored.getLong(2) == expected)
  }

  test("empty text scores exactly the EOS position") {
    val m = modelOf("a b")
    val scored = NgramLm.score(Seq((1L, "")).toDF("doc_id", "text"),
      "text", m, Seq("doc_id")).collect().head
    assert(scored.getLong(1) == 1L) // only (<s>,<s>,</s>)
  }

  test("merged batch models equal the direct full train") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(40)
    val full = NgramLm.train(docs, "text")
    val merged = NgramLm.merge(
      NgramLm.train(docs.where(col("doc_id") % 2 === 0), "text"),
      NgramLm.train(docs.where(col("doc_id") % 2 === 1), "text"))
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(set(merged.tri) == set(full.tri))
    assert(set(merged.big) == set(full.big))
    assert(set(merged.uni) == set(full.uni))
    assert(set(merged.scal) == set(full.scal))
  }

  test("scoring plan: n-gram joins are equi-joins; only the scalars row nest-loops") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val m = NgramLm.train(docs, "text")
    val plan = NgramLm.score(docs, "text", m, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the two crossJoin(broadcast(scal)) sites are 1-row broadcast
    // builds; every n-gram join must be an equi-join
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"unexpected nested-loop joins ($bnlj):\n$plan")
  }

  test("scoring is partitioning-invariant (integer costs commute)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val m = NgramLm.train(docs.where(col("doc_id") % 2 === 0), "text")
    val a = NgramLm.score(docs, "text", m, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = NgramLm.score(docs.repartition(7), "text", m, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
  }
}
