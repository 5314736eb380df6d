package graft.operators

import graft.functions.GraftFunctions

import org.apache.spark.internal.Logging
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
  *  - Lookup probes the artifact EXECUTOR-side: the per-file bloom
  *    blobs are filtered where they live by the codegen'd
  *    `bloom_might_contain` expression against the (tiny, literal)
  *    probe-key array, and only the surviving file NAMES come back to
  *    the driver — never the blobs. Driver memory is bounded by
  *    survivors, and a `maxFiles` cap (matching
  *    [[graft.plans.ZoneMapRule]]'s guard) declines to prune past it
  *    rather than risk a pathological survivor list.
  *  - The exact residual filter still applies, so false positives
  *    cost an extra file open, never a wrong row.
  *  - Probe values hash through the SAME Spark expression AND the
  *    same native type as the build: the probe strings are cast to
  *    the table's actual key-column type before `xxhash64`, so build
  *    and probe can never disagree on the hash (a raw string hash
  *    would silently false-negative on e.g. BIGINT keys).
  */
object BloomSkip extends Logging {

  /** 16384 bits / 4 hashes ≈ 4e-4 false-positive rate at ~300 keys
    * per file; at 10⁵ files that is ~40 spurious file opens per probe
    * key — negligible against the full-scan alternative. */
  val NumBits = 1 << 14
  val NumHashes = 4

  /** Past this many indexed files we decline to prune (None from
    * [[survivingFiles]]) rather than risk an unbounded survivor list
    * on the driver — the same posture as
    * `spark.graft.zoneMap.maxFiles` in [[graft.plans.ZoneMapRule]]. */
  val MaxFilesKey = "spark.graft.bloomSkip.maxFiles"

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

  /** Probe-key hashes for `values`: each probe string is cast to the
    * table's ACTUAL key-column type, then hashed by the same
    * `xxhash64` expression the build used — a #values-row local eval,
    * planning-time cost. */
  private def probeKeys(spark: SparkSession, tablePath: String,
      keyCol: String, values: Seq[String]): Array[Long] = {
    import spark.implicits._
    val keyType = spark.read.parquet(tablePath).schema(keyCol).dataType
    values.toDF("v")
      .select(xxhash64(col("v").cast(keyType))).as[Long].collect()
  }

  /** The executor-side membership probe as a frame: per-file bloom
    * rows filtered IN PLACE by `bloom_might_contain` against the
    * literal probe-key array, projecting only the file name. Package-
    * private so the spec can pin the plan shape (blobs filtered where
    * they live; only names cross to the driver). */
  private[operators] def probeFrame(spark: SparkSession, tablePath: String,
      keyCol: String, values: Seq[String]): DataFrame = {
    GraftFunctions.register(spark)
    val keys = probeKeys(spark, tablePath, keyCol, values)
    spark.read.parquet(bloomPath(tablePath, keyCol))
      .where(exists(array(keys.map(lit(_)): _*),
        k => GraftFunctions.bloom_might_contain(col("bloom"), k, NumHashes)))
      .select("file")
  }

  /** Files of `path` that might contain ANY of `values` in `keyCol`,
    * per the persisted bloom index — or None past the [[MaxFilesKey]]
    * cap, meaning "decline to prune, scan the table unpruned"
    * (correct, just unaccelerated). Only file NAMES are collected;
    * the bloom blobs are probed executor-side. */
  def survivingFiles(spark: SparkSession, tablePath: String, keyCol: String,
      values: Seq[String]): Option[Seq[String]] = {
    import spark.implicits._
    val maxFiles = spark.conf.get(MaxFilesKey, "100000").toInt
    val indexed = spark.read.parquet(bloomPath(tablePath, keyCol)).count()
    if (indexed > maxFiles) {
      logWarning(s"bloom skipping disabled for $tablePath: $indexed indexed " +
        s"files exceed $MaxFilesKey=$maxFiles; scanning unpruned")
      None
    } else Some(probeFrame(spark, tablePath, keyCol, values)
      .as[String].collect().toSeq)
  }

  /** Point-lookup scan `keyCol IN (values…)` that opens only the
    * bloom-surviving files (or the whole table when pruning is
    * declined past the cap). Result-identical to filtering the full
    * table: no false negatives by construction, and the residual
    * filter removes false positives. */
  def lookupScan(spark: SparkSession, tablePath: String, keyCol: String,
      values: Seq[String]): DataFrame = {
    val base = survivingFiles(spark, tablePath, keyCol, values) match {
      case None => spark.read.parquet(tablePath)
      case Some(files) if files.isEmpty =>
        spark.read.parquet(tablePath).where(lit(false))
      case Some(files) => spark.read.parquet(files: _*)
    }
    base.where(col(keyCol).isin(values: _*))
  }
}
