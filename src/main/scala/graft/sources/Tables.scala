package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet source layer for the driver-generated fixture tables
  * (/root/repo/TESTDATA.md). The reference delegates all scan I/O to
  * host Impala (`/root/reference/README.md:51-56`); here the host
  * engine is Spark's parquet DataSource V2, which gives predicate
  * pushdown, column pruning and partition-parallel reads for free —
  * the properties that matter when the same code points at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Config every session that reads these fixtures needs, applied at
    * session construction (Verify/Bench/tests) — NOT mutated here, so
    * `load` stays pure and order-independent.
    *
    * events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos (LongType) and convert at use
    * sites via `timestamp_micros(ts div 1000)`. */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all fixture tables as temp views so `spark.sql` queries
    * can reference them by bare name, mirroring the oracle SQL. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
