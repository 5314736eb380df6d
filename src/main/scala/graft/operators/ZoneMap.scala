package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min/max zone maps + clustered layout — the data-skipping pattern
  * one level finer than q68's directory pruning. At 100 TB a filtered
  * scan's first-order cost is the FILES it opens, not the rows it
  * filters: table formats (Delta/Iceberg/Hudi, and parquet row-group
  * stats inside a file) keep per-file min/max of hot columns so the
  * planner can drop whole files whose range cannot match the
  * predicate. Skipping only pays off when the layout cooperates: a
  * randomly-written table has every file spanning the whole key
  * domain (zero skippable files), while a range-clustered write gives
  * near-disjoint zones so a range predicate touches O(selectivity)
  * of the files.
  *
  * Both halves are implemented here Spark-first:
  *   - [[writeClustered]]: `repartitionByRange(keyCol) +
  *     sortWithinPartitions` — each output file covers a tight key
  *     range (this is exactly what OPTIMIZE ... ZORDER/cluster-by
  *     compaction jobs do, single-dimension case).
  *   - [[build]]: one aggregation pass → one (file, lo, hi, n) row
  *     per file. Tiny (one row per file — ~10⁵ rows at 100 TB), so it
  *     is driver-collectable metadata, the same class of object as
  *     the file listing a DataSource relation already holds.
  *   - [[skippingScan]]: prune the file list by interval overlap on
  *     the DRIVER (planning-time metadata work, not a distributed
  *     job), then hand Spark only the surviving files; the residual
  *     filter still applies because zone overlap does not imply every
  *     row matches.
  */
object ZoneMap {

  /** Range-clustered rewrite of `df` by `keyCol` into ~`numFiles`
    * files. Sorting within partitions additionally tightens parquet
    * row-group stats inside each file. */
  def writeClustered(df: DataFrame, keyCol: String, numFiles: Int,
      path: String): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(path)

  /** The zone map: per-file min/max of the clustering key plus the
    * row count. One shuffle-free-ish aggregation over the table —
    * at scale this runs once per compaction, not per query. */
  def build(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("n"))

  /** The sibling-directory convention [[graft.plans.ZoneMapRule]]
    * discovers zone maps by: `<table>.zonemap.<col>` — NEXT TO the
    * table, never inside it (a nested directory would be read back as
    * table data). */
  def zoneMapPath(tablePath: String, keyCol: String): String =
    s"${tablePath.stripSuffix("/")}.zonemap.$keyCol"

  /** Build and persist the zone map where [[graft.plans.ZoneMapRule]]
    * looks for it. Call after (re)writing the table — the rule
    * ignores maps older than any data file. Written PARTITIONED (no
    * coalesce): at lake file counts a single-task write would
    * serialize the whole map build through one executor; the rule and
    * [[skippingScan]] read the directory, so the file count of the
    * map itself is irrelevant. */
  def persist(spark: SparkSession, tablePath: String, keyCol: String): String = {
    val out = zoneMapPath(tablePath, keyCol)
    build(spark, tablePath, keyCol)
      .write.mode("overwrite").parquet(out)
    out
  }

  /** Range scan `keyCol BETWEEN lo AND hi` that opens ONLY the files
    * whose zone overlaps the interval. Survivors are filtered
    * executor-side and only their names collected (planning metadata);
    * an empty survivor list short-circuits to an empty frame with the
    * source schema without scanning anything but one footer. Past
    * `spark.graft.zoneMap.maxFiles` indexed files the scan declines to
    * prune — same driver-memory posture as the automatic
    * [[graft.plans.ZoneMapRule]] path — and reads the table unpruned
    * (correct, just unaccelerated). */
  def skippingScan(spark: SparkSession, path: String, zoneMap: DataFrame,
      keyCol: String, lo: Long, hi: Long): DataFrame = {
    val maxFiles = spark.conf
      .get(graft.plans.ZoneMapRule.MaxFilesKey, "100000").toInt
    if (zoneMap.count() > maxFiles)
      return spark.read.parquet(path).where(col(keyCol).between(lo, hi))
    val files = zoneMap
      .where(col("hi") >= lo && col("lo") <= hi)
      .select(col("file")).collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(path).where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.where(col(keyCol).between(lo, hi))
  }
}
