package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class SequencePackSpec extends SparkTestBase {
  import spark.implicits._

  private val Budget = 100L

  private def packed(n: Long) = SequencePack.assignBins(
    (1L to n).map(i => (i, 1L + (i * 7) % 40)).toDF("id", "tok"),
    "id", "tok", numShards = 4, budgetTokens = Budget, seed = "sq")

  test("bins are contiguous from 0 and every doc starts inside its bin") {
    val rows = packed(2000)
      .select("shard", "bin", "id", "tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val bins = docs.map(_._2).distinct.sorted
      assert(bins.head == 0L && bins.toSeq == (0L to bins.last).toSeq,
        s"shard $shard bins not contiguous: ${bins.toSeq}")
      // replay the running sum: each doc's start offset DIV budget
      // must be its assigned bin
      var cum = 0L
      docs.sortBy(_._3).foreach { case (_, bin, id, tok) =>
        assert(cum / Budget == bin, s"doc $id: start $cum -> bin $bin")
        cum += tok
      }
    }
  }

  test("appending higher ids never moves an existing assignment") {
    val before = packed(500).select("id", "shard", "bin").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val after = packed(800).where(col("id") <= 500)
      .select("id", "shard", "bin").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(before == after,
      "growth with later ids must not repack earlier documents")
  }

  test("the only exchange is the shard partitioning") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val plan = SequencePack
      .assignBins(docs, "doc_id", "n_tokens", 8, 1500L, "pk")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
    assert(plan.contains("hashpartitioning(shard"), plan)
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, 2L)).toDF("id", "tok")
    intercept[IllegalArgumentException] {
      SequencePack.assignBins(df, "id", "tok", 0, 100L, "s")
    }
    intercept[IllegalArgumentException] {
      SequencePack.assignBins(df, "id", "tok", 4, 0L, "s")
    }
  }
}
