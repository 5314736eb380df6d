package graft.operators

import graft.functions.{BloomFilter, GraftFunctions}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter data skipping — membership pruning for
  * point lookups on columns UNCORRELATED with the table layout,
  * where min/max zone maps ([[ZoneMap]]) cannot prune at all. The
  * canonical 100 TB case: a lake laid out by ingest order / document
  * id, probed by URL or content hash. Every file's min/max on that
  * column spans essentially the whole domain (zones all overlap every
  * probe), but a 2 KiB Bloom bit-set per file answers "might this
  * file contain key X?" with no false negatives — so a point lookup
  * opens O(matching files + ε·false positives) instead of the whole
  * table. This is the same skipping class Parquet bloom filters and
  * Delta/Iceberg bloom indexes occupy, built here from the library's
  * own [[graft.functions.BloomAgg]] aggregate.
  *
  * Scale shape:
  *  - Build is ONE aggregation pass over the table: one (file, bloom)
  *    row per file, byte-wise-OR merged map-side; the artifact is
  *    ~2 KiB × #files and lives in a sibling directory (the
  *    [[ZoneMap]] convention).
  *  - Lookup prunes on the DRIVER (planning-time metadata, same class
  *    as the file listing itself), then hands Spark only surviving
  *    files; the exact residual filter still applies, so false
  *    positives cost an extra file open, never a wrong row.
  *  - Keys are `xxhash64(col)`: probe values hash through the SAME
  *    Spark expression (a 1-row local eval at planning time), so
  *    build and probe can never disagree on the hash.
  */
object BloomSkip {

  /** 16384 bits / 4 hashes ≈ 4e-4 false-positive rate at ~300 keys
    * per file; at 10⁵ files that is ~40 spurious file opens per probe
    * key — negligible against the full-scan alternative. */
  val NumBits = 1 << 14
  val NumHashes = 4

  /** Sibling-directory artifact convention, next to the table like
    * [[ZoneMap.zoneMapPath]]: `<table>.bloom.<col>`. */
  def bloomPath(tablePath: String, keyCol: String): String =
    s"${tablePath.stripSuffix("/")}.bloom.$keyCol"

  /** One (file, bloom) row per data file of `path`. */
  def build(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    GraftFunctions.register(spark)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(GraftFunctions
        .bloom_agg(xxhash64(col(keyCol)), NumBits, NumHashes).as("bloom"))
  }

  /** Build and persist the per-file bloom index for `keyCol`. */
  def persist(spark: SparkSession, tablePath: String, keyCol: String): String = {
    val out = bloomPath(tablePath, keyCol)
    build(spark, tablePath, keyCol)
      .coalesce(1).write.mode("overwrite").parquet(out)
    out
  }

  /** Files of `path` that might contain ANY of `values` in `keyCol`,
    * per the persisted bloom index. */
  def survivingFiles(spark: SparkSession, tablePath: String, keyCol: String,
      values: Seq[String]): Seq[String] = {
    import spark.implicits._
    // hash the probe values through the same Spark expression the
    // build used — a #values-row local eval, planning-time cost
    val keys = values.toDF("v").select(xxhash64(col("v"))).as[Long].collect()
    spark.read.parquet(bloomPath(tablePath, keyCol))
      .collect()
      .filter { r =>
        val bloom = r.getAs[Array[Byte]]("bloom")
        keys.exists(k => BloomFilter.mightContain(bloom, k, NumHashes))
      }
      .map(_.getAs[String]("file")).toSeq
  }

  /** Point-lookup scan `keyCol IN (values…)` that opens only the
    * bloom-surviving files. Result-identical to filtering the full
    * table: no false negatives by construction, and the residual
    * filter removes false positives. */
  def lookupScan(spark: SparkSession, tablePath: String, keyCol: String,
      values: Seq[String]): DataFrame = {
    val files = survivingFiles(spark, tablePath, keyCol, values)
    val base =
      if (files.isEmpty) spark.read.parquet(tablePath).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(keyCol).isin(values: _*))
  }
}
