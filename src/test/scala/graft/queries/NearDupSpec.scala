package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class NearDupSpec extends SparkTestBase {

  test("candidate-pair plan is a band equi-join: no cartesian product") {
    val plan = NearDupQueries.candidatePairs(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("LSH finds a planted near-duplicate and skips unrelated docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"other$i").mkString(" ")
    Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/neardup_fixture/documents.parquet")

    val pairs = NearDupQueries.candidatePairs(spark, "/tmp/neardup_fixture")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc produced a candidate: $pairs")
  }

  test("identical docs share a full signature; disjoint docs share no band") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6"
    Seq((1L, a), (2L, a), (3L, "z1 z2 z3 z4 z5 z6"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/neardup_fixture2/documents.parquet")
    val pairs = NearDupQueries.candidatePairs(spark, "/tmp/neardup_fixture2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }
}
