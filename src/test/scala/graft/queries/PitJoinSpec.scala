package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Hand-valued lookahead-leakage check for the q244 point-in-time
  * join: each fact version must see exactly its own dimension epoch. */
class PitJoinSpec extends SparkTestBase {

  test("q244: a k%7=1 customer is seen at bal/bal+100/bal+200 by version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pit").toString
    // one customer with the two-version update chain (k%7=1): history
    // is [v0 bal=5.00], [v1 bal+100 = 105.00], [v2.. bal+200 = 205.00)
    Seq((8L, "c", 5.00)).toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // orders pinned to versions 0..3 via o_orderkey % 4
    Seq((4L, 8L), (5L, 8L), (6L, 8L), (7L, 8L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.SparkEntry.queries("q244_pit_join")(spark, dir)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // vo=0 -> 500c, vo=1 -> 10500c, vo in {2,3} -> 20500c (open)
    assert(got(0L) == ((1L, 1L, 500L)), got.toString)
    assert(got(1L) == ((1L, 1L, 10500L)), got.toString)
    assert(got(2L) == ((1L, 1L, 20500L)), got.toString)
    assert(got(3L) == ((1L, 1L, 20500L)), got.toString)
  }

  test("q244: a tombstoned key is unmatched at and after its delete version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pit2").toString
    // k%7=0 -> deleted at version 1: visible at vo=0, gone at vo>=1
    Seq((7L, "c", 3.00)).toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((4L, 7L), (5L, 7L), (6L, 7L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.SparkEntry.queries("q244_pit_join")(spark, dir)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((1L, 1L, 300L)), got.toString)
    assert(got(1L) == ((1L, 0L, 0L)), got.toString)
    assert(got(2L) == ((1L, 0L, 0L)), got.toString)
  }
}
