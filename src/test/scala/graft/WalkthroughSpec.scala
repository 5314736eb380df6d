package graft

import org.apache.spark.sql.functions.col

/** The reference README's end-to-end walkthrough (`README.md:35-62`:
  * create function → create table → insert → select), run VERBATIM
  * against this library — the statements a migrating Impala user
  * keeps, with `CREATE AGGREGATE FUNCTION ... location '.so'`
  * replaced by session registration and the table living in the
  * durable v2 catalog. */
class WalkthroughSpec extends SparkTestBase {

  test("the README walkthrough runs verbatim: median of (1.1..5.5, k=5) = 3.3") {
    // step 1: create the function (registration replaces the DDL)
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.catalog.graftwt",
      classOf[graft.sources.MemCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_wt").toString
    spark.conf.set("spark.sql.catalog.graftwt.path", root)
    // step 2: create a test table
    spark.sql("DROP TABLE IF EXISTS graftwt.numbers")
    spark.sql("CREATE TABLE graftwt.numbers (x DOUBLE)")
    // step 3: insert some simple data
    spark.sql("INSERT INTO graftwt.numbers VALUES (1.1), (2.2), (3.3), (4.4), (5.5)")
    // step 4: calculate the median — the reference's exact statement
    val med = spark.sql(
      "SELECT CAST(appx_median_bounded(x, 5) AS DOUBLE) AS m FROM graftwt.numbers")
      .head().getDouble(0)
    assert(med == 3.3, s"upper-middle median of 5 values, got $med")
    // and the table is a real lakehouse table: history + time travel
    assert(spark.sql("SELECT count(*) FROM graftwt.numbers VERSION AS OF 1")
      .head().getLong(0) == 5L)
  }
}
