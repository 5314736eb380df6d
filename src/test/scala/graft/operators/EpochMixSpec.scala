package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class EpochMixSpec extends SparkTestBase {
  import spark.implicits._

  private def mix(ids: Seq[Long], dom: String, bp: Int) =
    EpochMix.replicate(
      ids.map(i => (i, dom)).toDF("id", "d"), "id", "d",
      Map(dom -> bp), defaultBp = 10000, seed = "s")

  test("1.0 epochs is the identity; 0 epochs is empty") {
    val ids = (1L to 500L)
    val one = mix(ids, "x", 10000).select("id", "epoch")
      .as[(Long, Int)].collect()
    assert(one.toSeq.sorted == ids.map(_ -> 1).sorted)
    assert(mix(ids, "x", 0).count() == 0L)
  }

  test("2.5 epochs emits 2 or 3 copies per id, ~2.5 on average") {
    val rows = mix(1L to 4000L, "x", 25000)
      .groupBy("id").agg(count(lit(1)).as("n"), max("epoch").as("m"))
      .as[(Long, Long, Int)].collect()
    assert(rows.forall { case (_, n, m) => (n == 2L || n == 3L) && m == n })
    val mean = rows.map(_._2).sum.toDouble / rows.length
    assert(math.abs(mean - 2.5) < 0.05, s"mean=$mean")
  }

  test("a document's multiplicity depends only on (seed, id, rate)") {
    val full = mix(1L to 1000L, "x", 13000).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    val subset = mix((1L to 1000L).filter(_ % 7 == 0), "x", 13000)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(subset == full.filter(_._1 % 7 == 0),
      "a smaller corpus must not change any id's copy count")
  }

  test("unlisted domains fall to the default rate") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "d")
    val got = EpochMix.replicate(df, "id", "d",
      Map("a" -> 20000), defaultBp = 10000, seed = "s")
      .groupBy("d").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("replication is a map-only plan: no exchange") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val plan = EpochMix.replicate(docs, "doc_id", "lang",
      Map("en" -> 3000), 10000, "s").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("negative epoch basis points are rejected") {
    val df = Seq((1L, "a")).toDF("id", "d")
    intercept[IllegalArgumentException](
      EpochMix.replicate(df, "id", "d", Map("a" -> -1), 10000, "s"))
  }
}
