package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class TextSketchesSpec extends SparkTestBase {

  private def simhashOf(text: String): Long = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextSketches.simhash(col("text"))).collect()(0).getLong(0)
  }

  test("simhash matches the DuckDB-computed reference value") {
    // locked cross-engine: computed independently in DuckDB 1.0 with
    // the same md5/bit-vote arithmetic
    assert(simhashOf("the cat sat") == 954273034597534321L)
  }

  test("codegen'd simhash60 kernel is bit-identical to the HOF reference") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox",
      "single",
      "trailing space ",          // split(-1) keeps the empty token
      " leading",
      "double  space",            // empty token in the middle
      "unicode café naïve 日本語",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    // repartition blocks ConvertToLocalRelation from constant-folding
    // the expressions away, so the executed plan really runs the kernel
    val df = texts.toDF("text").repartition(2)
      .select(col("text"),
        TextSketches.simhash(col("text")).as("hof"),
        GraftFunctions.simhash60(col("text")).as("gen"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"kernel diverged from HOF on '${r.getString(0)}'")
    }
    // and the kernel runs inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("simhash60"), plan)
  }

  test("simhash of near-identical texts is close, disjoint texts far") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val near = (1 to 50).map(i => if (i == 25) "CHANGED" else s"tok$i").mkString(" ")
    val far = (100 to 150).map(i => s"zzz$i").mkString(" ")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(simhashOf(base), simhashOf(near)) <= 10,
      "one changed token of 50 must flip few bits")
    assert(ham(simhashOf(base), simhashOf(far)) >= 15,
      "disjoint vocab should land ~30 bits apart")
  }

  test("shingles produce n-grams in order and de-duplicated") {
    import spark.implicits._
    val out = Seq("a b c d a b c d").toDF("text")
      .select(TextSketches.shingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(out.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("minhash component equals the min md5 over the shingle set") {
    import spark.implicits._
    val shingleSet = Seq("x y z", "p q r")
    val expected = shingleSet.map { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"3:$s".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }.min
    val got = Seq("ignored").toDF("text")
      .select(TextSketches.minhash(3, typedlit(shingleSet))).collect()(0).getString(0)
    assert(got == expected)
  }
}
