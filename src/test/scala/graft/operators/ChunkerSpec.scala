package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int) =
    Chunker.chunks(Seq(1L -> text).toDF("doc_id", "text"), "doc_id",
      split(col("text"), " "), size, stride)
      .orderBy("chunk_idx")
      .as[(Long, Int, Long, String)].collect()
      .map { case (_, i, n, c) => (i, n, c) }.toSeq

  test("windows cover every token, overlap by size-stride, last may be short") {
    val toks = (1 to 29).map(i => s"t$i")
    val got = chunksOf(toks.mkString(" "), size = 16, stride = 12)
    assert(got.map(_._1) == Seq(0, 1, 2))
    assert(got(0)._3 == toks.slice(0, 16).mkString(" "))
    assert(got(1)._3 == toks.slice(12, 28).mkString(" "))
    assert(got(2)._3 == toks.slice(24, 29).mkString(" "))   // short tail
    assert(got.map(_._2) == Seq(16L, 16L, 5L))
  }

  test("a document at or under the window size yields exactly one chunk") {
    for (n <- Seq(1, 15, 16)) {
      val toks = (1 to n).map(i => s"t$i")
      val got = chunksOf(toks.mkString(" "), 16, 12)
      assert(got == Seq((0, n.toLong, toks.mkString(" "))), s"n=$n")
    }
  }

  test("chunk count matches 1 + ceil(max(dl-size,0)/stride) for all dl") {
    for (dl <- 1 to 60) {
      val got = chunksOf((1 to dl).map(i => s"t$i").mkString(" "), 16, 12)
      val want = 1 + math.ceil(math.max(dl - 16, 0) / 12.0).toInt
      assert(got.size == want, s"dl=$dl")
      // reconstruction: stitching chunk heads + the last chunk
      // reproduces the document exactly
      val stitched = (got.dropRight(1).map(_._3.split(" ").take(12))
        :+ got.last._3.split(" ")).flatten
      assert(stitched.toSeq == (1 to dl).map(i => s"t$i"), s"dl=$dl")
    }
  }

  test("chunking is a map-only plan: no exchange, stays in codegen") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val plan = Chunker.chunks(docs, "doc_id", split(col("text"), " "), 16, 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Generate"), plan)   // the posexplode
  }

  test("a stride wider than the window is rejected") {
    val docs = Seq(1L -> "a b").toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunker.chunks(docs, "doc_id", split(col("text"), " "), 8, 9))
  }
}
