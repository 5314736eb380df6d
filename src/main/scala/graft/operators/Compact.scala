package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the lake-maintenance pass every long-lived
  * 100 TB table needs. Streaming ingest, partitioned writes, and
  * incremental jobs leave tables as thousands of KB-scale files; scan
  * cost then becomes file-open overhead (one footer read + one task
  * per file) instead of bytes. Table formats run OPTIMIZE/compaction
  * jobs for exactly this; here it is expressed Spark-first:
  *
  *   - [[plan]] is driver-side METADATA work: one file listing (the
  *     same listing a scan's planning already performs) sizes the
  *     input and fixes the output file count as ceil(bytes/target).
  *   - [[rewrite]] moves the data in ONE narrow pass:
  *     `coalesce(targetFiles)` merges input splits without a shuffle —
  *     each output task reads a run of input files sequentially and
  *     streams it back out. No wide exchange, no sort, no driver data
  *     path; cost is exactly read-bytes + write-bytes.
  *   - `balanced = true` swaps the narrow merge for an AQE REBALANCE
  *     shuffle sized by `spark.sql.adaptive.advisoryPartitionSizeInBytes`
  *     — the knob to reach for when input files are so skewed that
  *     index-contiguous coalesce runs would produce lopsided output
  *     (AQE splits oversized partitions and fuses undersized ones).
  *     It pays one shuffle of the data; the default does not.
  *
  * The rewrite must be result-invisible: the q130 gate aggregates the
  * compacted copy against an oracle that aggregates the ORIGINAL
  * table, and CompactSpec pins the file-count math, the no-Exchange
  * plan of the default path, and byte-level content equality.
  */
object Compact {

  /** Driver-side sizing: data files under `path` (hidden/_-prefixed
    * commit markers excluded) and the output file count a
    * `targetBytes` budget implies. One row per file — the same scale
    * class as the scan planner's own listing (~10⁵ entries at 100 TB
    * per partition-directory, which is the unit compaction jobs walk). */
  final case class CompactionPlan(inputFiles: Int, totalBytes: Long,
      targetFiles: Int)

  def plan(spark: SparkSession, path: String, targetBytes: Long): CompactionPlan = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // RECURSIVE listing, because rewrite() reads via spark.read.parquet
    // which descends into partition directories — a flat listStatus
    // would see 0 files on a partitioned table and silently size the
    // whole rewrite at targetFiles=1
    val it = fs.listFiles(p, true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).filter { st =>
        val rel = st.getPath.toUri.getPath
          .stripPrefix(p.toUri.getPath).split('/')
        st.isFile &&
          !rel.exists(s => s.startsWith("_") || s.startsWith("."))
      }.toArray
    require(files.nonEmpty, s"no data files under $path — nothing to compact")
    val total = files.map(_.getLen).sum
    CompactionPlan(files.length, total,
      math.max(1L, (total + targetBytes - 1) / targetBytes).toInt)
  }

  /** Compact `inPath` into `outPath` aiming at `targetBytes` per
    * output file; returns the plan it executed. Writes to a separate
    * path — swapping it in (rename, or a table-format commit) is the
    * caller's atomic step, so readers never observe a half-compacted
    * table. */
  def rewrite(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, balanced: Boolean = false): CompactionPlan = {
    val p = plan(spark, inPath, targetBytes)
    compacted(spark.read.parquet(inPath), p, balanced)
      .write.mode("overwrite").parquet(outPath)
    p
  }

  /** The data-moving frame of [[rewrite]], exposed so CompactSpec can
    * assert the default path stays a narrow `Coalesce` (no Exchange). */
  private[graft] def compacted(df: DataFrame, p: CompactionPlan,
      balanced: Boolean): DataFrame =
    if (balanced) df.hint("rebalance") else df.coalesce(p.targetFiles)
}
