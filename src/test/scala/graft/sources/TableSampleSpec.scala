package graft.sources

import graft.SparkTestBase

/** TABLESAMPLE pushdown (`SupportsPushDownTableSample`, FULL — the
  * scan owns the sampling): cluster sampling at split grain, each
  * split one seeded Bernoulli draw, so `TABLESAMPLE (p PERCENT)` on a
  * many-file table reads ~p% of the BYTES. Unbiased per row (a row's
  * inclusion probability is its split's draw = p), REPEATABLE(seed)
  * deterministic, declined when the table is too coarse for the
  * fraction or with replacement — Spark then row-samples a full scan.
  * A pushed sample also disables metadata-served aggregates (they
  * describe the FULL table). */
class TableSampleSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_smp").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gsmp", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsmp.path", root)
  }

  private def build(table: String, files: Int, rowsPer: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS gsmp.$table")
    spark.sql(s"CREATE TABLE gsmp.$table (k BIGINT)")
    (0 until files).foreach(i => spark.sql(
      s"INSERT INTO gsmp.$table SELECT /*+ REPARTITION(1) */ " +
        s"id + ${i * rowsPer} FROM RANGE($rowsPer)"))
  }

  test("sampled scan reads only the selected splits; REPEATABLE is " +
      "deterministic; fraction lands near the ask") {
    setup()
    build("t", files = 40, rowsPer = 100)
    ParquetBatchIO.batchReads.set(0)
    val s1 = spark.sql(
      "SELECT k FROM gsmp.t TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .collect().map(_.getLong(0)).sorted
    val readers = ParquetBatchIO.batchReads.get()
    assert(readers < 40, s"sampling must not open every reader: $readers")
    // cluster grain: whole 100-row files, count a multiple of 100
    assert(s1.length % 100 == 0 && s1.length > 0 && s1.length < 4000)
    // deterministic repeat
    val s2 = spark.sql(
      "SELECT k FROM gsmp.t TABLESAMPLE (20 PERCENT) REPEATABLE (42)")
      .collect().map(_.getLong(0)).sorted
    assert(java.util.Arrays.equals(s1, s2), "REPEATABLE must repeat")
    // a different seed selects a different subset (overwhelmingly)
    val s3 = spark.sql(
      "SELECT k FROM gsmp.t TABLESAMPLE (20 PERCENT) REPEATABLE (43)")
      .collect().map(_.getLong(0)).sorted
    assert(!java.util.Arrays.equals(s1, s3),
      "different seeds must select different splits")
    // fraction sanity at this seed (deterministic, pinned):
    // n=40 draws at p=.2 — accept a wide deterministic band
    assert(s1.length >= 200 && s1.length <= 1600,
      s"20% of 4000 landed at ${s1.length}")
  }

  test("aggregates over a pushed sample are computed from the " +
      "sampled rows, never served from full-table metadata") {
    setup()
    build("a", files = 40, rowsPer = 100)
    val full = spark.sql("SELECT count(*) FROM gsmp.a").head().getLong(0)
    assert(full == 4000L)
    val sampled = spark.sql(
      "SELECT count(*) AS n FROM gsmp.a TABLESAMPLE (20 PERCENT) " +
        "REPEATABLE (42)").head().getLong(0)
    assert(sampled > 0 && sampled < full,
      s"sampled count must come from sampled rows: $sampled")
  }

  test("declines: too few splits for the fraction, with replacement — " +
      "Spark row-samples a full scan instead") {
    setup()
    build("d", files = 4, rowsPer = 100)
    // 4 files at 10%: cluster grain would be ~all-or-nothing — the
    // push declines and Spark's own Sample row-samples (count is not
    // a multiple of 100 with overwhelming probability)
    val n = spark.sql(
      "SELECT k FROM gsmp.d TABLESAMPLE (10 PERCENT) REPEATABLE (7)")
      .collect().length
    // row-grain Bernoulli over 400 rows at 10%: must not be cluster
    // sized (0/100/200/...) — allow the (vanishingly unlikely) exact
    // multiples only when small
    assert(n > 0 && n < 400)
    assert(n % 100 != 0, s"decline lost: cluster-shaped count $n")
    // with replacement: decline (a split cannot be emitted twice)
    val wr = spark.table("gsmp.d").sample(withReplacement = true,
      fraction = 0.5, seed = 7).count()
    assert(wr > 0 && wr < 800)
  }

  test("sample composes with pushed filters and LIMIT truncation") {
    setup()
    build("c", files = 40, rowsPer = 100)
    // filter first (file skipping), then sample the survivors
    val f = spark.sql(
      "SELECT k FROM gsmp.c TABLESAMPLE (50 PERCENT) REPEATABLE (11) " +
        "WHERE k >= 2000").collect().map(_.getLong(0))
    assert(f.forall(_ >= 2000L))
    assert(f.length % 100 == 0 && f.length > 0 && f.length < 2000)
    // LIMIT over the sampled subset still truncates planning
    ParquetBatchIO.batchReads.set(0)
    val l = spark.sql(
      "SELECT k FROM gsmp.c TABLESAMPLE (50 PERCENT) REPEATABLE (11) " +
        "LIMIT 150").collect()
    assert(l.length == 150)
    assert(ParquetBatchIO.batchReads.get() <= 2,
      s"LIMIT over sample must plan the covering prefix of sampled " +
        s"splits: ${ParquetBatchIO.batchReads.get()}")
  }
}
