package graft.operators

import graft.SparkTestBase
import graft.queries.SourceQueries

import org.apache.spark.sql.functions._

/** Zone-map skipping is a pure planning optimization: it must change
  * WHICH FILES a range scan opens (that's the 100 TB win) and must
  * never change the result. Both directions are pinned here against
  * the clustered lineitem copy q99 queries. */
class ZoneMapSpec extends SparkTestBase {

  private lazy val path = SourceQueries.clusteredLineitem(spark, sf0001)
  private lazy val zmap = SourceQueries.lineitemZoneMap(spark, sf0001)

  test("the zone map has one row per file and consistent bounds") {
    val allFiles = spark.read.parquet(path).inputFiles.toSet
    val rows = zmap.collect()
    assert(rows.map(_.getString(0)).toSet == allFiles)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)),
      "every zone must have lo <= hi")
    // the clustered layout's zones are pairwise DISJOINT (range
    // partitioning assigns each key to exactly one partition), which
    // is what makes skipping effective
    val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"zones must not interleave: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
  }

  test("a narrow range opens strictly fewer files, same rows") {
    val skipped = ZoneMap.skippingScan(spark, path, zmap, "l_orderkey", 100L, 400L)
    val nAll = spark.read.parquet(path).inputFiles.length
    val nSkipped = skipped.inputFiles.length
    assert(nSkipped > 0 && nSkipped < nAll / 2,
      s"a ~20% key range should open well under half the files ($nSkipped of $nAll)")

    val expected = spark.read.parquet(path)
      .where(col("l_orderkey").between(100, 400))
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
    val got = skipped.agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
    assert(got == expected)
    assert(got.getLong(0) > 0, "the test range must actually select rows")
  }

  test("a range beyond the key domain opens nothing and returns nothing") {
    val skipped = ZoneMap.skippingScan(
      spark, path, zmap, "l_orderkey", Long.MaxValue - 10, Long.MaxValue)
    assert(skipped.count() == 0)
  }

  test("past the maxFiles cap: declines to prune, identical results") {
    withConf(graft.plans.ZoneMapRule.MaxFilesKey -> "2") {
      val unpruned =
        ZoneMap.skippingScan(spark, path, zmap, "l_orderkey", 100L, 400L)
      // over the cap every file stays open — the unpruned fallback
      assert(unpruned.inputFiles.length ==
        spark.read.parquet(path).inputFiles.length)
      val expected = spark.read.parquet(path)
        .where(col("l_orderkey").between(100, 400))
        .agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
      assert(unpruned.agg(count(lit(1)), sum(col("l_orderkey")))
        .collect().head == expected)
    }
  }
}
