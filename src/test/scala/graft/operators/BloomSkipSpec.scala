package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class BloomSkipSpec extends SparkTestBase {

  private lazy val path: String = {
    val p = "/root/repo/target/graft_test/bloomskip_docs"
    ZoneMap.writeClustered(
      graft.sources.Tables.load(spark, sf0001, "documents")
        .select(col("doc_id"), col("source"),
          concat(col("source"), lit("/"), col("doc_id").cast("string"))
            .as("url")),
      "doc_id", 16, p)
    BloomSkip.persist(spark, p, "url")
    p
  }

  private def allFiles: Long =
    spark.read.parquet(path).select(input_file_name()).distinct().count()

  test("lookup is result-identical to filtering the full table") {
    val urls = Seq("src7/7", "src3/23", "src0/0", "srcX/absent")
    val got = BloomSkip.lookupScan(spark, path, "url", urls)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = spark.read.parquet(path).where(col("url").isin(urls: _*))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got == Seq(0L, 7L, 23L))
  }

  test("a present key opens ~1 of 16 files; an absent key ~0") {
    assert(allFiles == 16L)
    val present = BloomSkip.survivingFiles(spark, path, "url", Seq("src3/23"))
    assert(present.size >= 1 && present.size <= 2, present.mkString(","))
    val absent = BloomSkip.survivingFiles(spark, path, "url",
      Seq("srcX/not-there"))
    assert(absent.size <= 1, absent.mkString(","))
  }

  test("min/max zones on the same column could not have pruned") {
    // every file's lexicographic [min,max] straddles the probe url —
    // a zone map on url keeps all 16 files, the bloom keeps ~1
    val zones = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col("url")).as("lo"), max(col("url")).as("hi"))
      .collect()
    val probe = "src3/23"
    assert(zones.forall(r =>
      r.getString(1) <= probe && probe <= r.getString(2)))
  }

  test("no surviving files short-circuits to an empty, schema-correct frame") {
    val df = BloomSkip.lookupScan(spark, path, "url", Seq("srcX/void"))
    assert(df.columns.toSeq == Seq("doc_id", "source", "url"))
    assert(df.count() == 0L)
  }
}
