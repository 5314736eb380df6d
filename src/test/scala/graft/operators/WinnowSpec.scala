package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Semantics pins for winnowing fingerprints: agreement with a
  * brute-force reference on fixture text, the Schleimer et al.
  * detection guarantee, density, partitioning invariance, and the
  * overlap join's boilerplate cap. */
class WinnowSpec extends SparkTestBase {

  import spark.implicits._

  /** Brute-force reference winnowing (independent of the SQL
    * formulation): explicit windows, rightmost-min selection. */
  private def bruteFp(text: String): Set[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split(" ", -1).toSeq
    val n = toks.length - (Winnow.K - 1)
    if (n < 1) return Set.empty
    val hs = (1 to n).map { i =>
      val gram = toks.slice(i - 1, i - 1 + Winnow.K).mkString(" ")
      val hex = md.digest(gram.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(10)
      java.lang.Long.parseLong(hex, 16)
    }
    val ck = (1 to n).map(i => ((hs(i - 1) << Winnow.PosBits) +
      (Winnow.PosCap - i), i))
    val starts = if (n < Winnow.W) Seq(1) else 1 to (n - Winnow.W + 1)
    starts.map { s =>
      val win = ck.slice(s - 1, math.min(s - 1 + Winnow.W, n))
      val m = win.map(_._1).min
      (m >> Winnow.PosBits, Winnow.PosCap - (m & Winnow.PosCap))
    }.toSet.map { p: (Long, Long) => p }
  }

  private def opFp(rows: Seq[(Long, String)]) =
    Winnow.fingerprints(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("matches the brute-force reference on 30 fixture documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = opFp(docs.toSeq)
    docs.foreach { case (id, text) =>
      val want = bruteFp(text)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("any shared run of W+K-1 tokens yields a shared fingerprint hash") {
    val shared = (1 to Winnow.W + Winnow.K - 1).map(i => s"run$i").mkString(" ")
    val a = s"alpha beta gamma $shared delta"
    val b = s"one two three four five $shared six seven"
    val fp = opFp(Seq((1L, a), (2L, b)))
    assert(fp(1L).map(_._1).intersect(fp(2L).map(_._1)).nonEmpty)
  }

  test("density: short docs give the single global min; none exceed gram count") {
    val fp = opFp(Seq((1L, "a b c d e"), (2L, "a b c"))) // n=2 grams, n=0
    assert(fp(1L).size == 1) // 2 grams < W=5 -> one global min
    assert(!fp.contains(2L)) // fewer than K tokens -> no grams
  }

  test("fingerprints are partitioning-invariant") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(60)
    val a = Winnow.fingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Winnow.fingerprints(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("per-row array selection equals the window-function form") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(80)
    val win = Winnow.fingerprints(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2) << Winnow.PosBits) +
        (Winnow.PosCap - r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val arr = Winnow.withFingerprintKeys(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
      .filter(_._2.nonEmpty).toMap
    assert(arr == win)
  }

  test("overlap plan joins on the hash key — no cartesian, no nested loop") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val plan = Winnow.overlap(docs, "doc_id", "text", 2, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("overlap reports a planted near-copy and the df cap silences boilerplate") {
    val run = (1 to 20).map(i => s"x$i").mkString(" ")
    val pair = Seq(10L -> s"intro $run outro", 11L -> s"other words $run more")
    // 12 copies of one text: every fingerprint's df = 12 > maxDf = 10
    val boiler = (100L to 111L).map(i => i -> "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")
    val df = (pair ++ boiler).toDF("doc_id", "text")
    val got = Winnow.overlap(df, "doc_id", "text", minShared = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L)))
  }
}
