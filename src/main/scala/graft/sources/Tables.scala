package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.LongType

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
    * Earlier fixture generations wrote events.ts as parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects; the
    * conf reads that representation as raw nanos (LongType). Current
    * fixtures write plain TIMESTAMP(MICROS); [[tsMicros]] adapts to
    * whichever representation a given file carries. */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Epoch-micros view of an events frame's `ts` column, whatever the
    * fixture generation wrote: raw nanos (LongType via the legacy
    * conf) divide down to micros with integer `DIV` (a `/` would be
    * DOUBLE division and lose precision at nano magnitudes);
    * timestamp columns (NTZ or not) go through `unix_micros` under
    * the session's UTC timezone — the same instant DuckDB's
    * `epoch_us(ts)` computes on the naive value. */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts DIV 1000")
    case _ => unix_micros(col("ts").cast("timestamp"))
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all fixture tables as temp views so `spark.sql` queries
    * can reference them by bare name, mirroring the oracle SQL. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
