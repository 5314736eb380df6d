package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** ANALYZE-time per-column statistics (NDV + byte lengths) — the
  * CBO sidecar. Exact min/max/nullCount already ride the commit-log
  * stats fold ([[CommitStats]]); what a cost-based optimizer
  * additionally needs is the NUMBER OF DISTINCT VALUES per column
  * (join-cardinality and aggregate-output estimation) and realistic
  * byte widths for variable-length columns (broadcast-threshold
  * sizing). Those can't be folded incrementally from per-file
  * sidecars without a sketch, so they are computed by an explicit
  * `ANALYZE TABLE ... COMPUTE STATISTICS` pass — one distributed
  * HyperLogLog aggregate over the live table (mergeable partial
  * states, so the pass is a single map-side-combined exchange even at
  * 100 TB) — and recorded here, stamped with the snapshot version
  * they described.
  *
  * Keying is FIELD ID, not name, so statistics survive RENAME COLUMN
  * and never mis-attach after DROP + re-ADD of a same-named column
  * (ids are never reused). Like every engine's ANALYZE stats (Delta,
  * Hive, Postgres), the numbers go stale as commits land; staleness
  * is visible as `version` vs the table's current version, and serves
  * estimates — never results.
  */
private[sources] final case class AnalyzedCol(ndv: Long, avgLen: Long,
    maxLen: Long)

private[sources] final case class AnalyzedStats(version: Int,
    cols: Map[Long, AnalyzedCol])

private[sources] object AnalyzedColStats {

  val FileName = "_colstats"

  /** Atomic rewrite (tmp + move), the sidecar convention — a crash
    * mid-write leaves the previous file intact. */
  def write(dir: Path, s: AnalyzedStats): Unit = {
    val lines = s"version\t${s.version}" +:
      s.cols.toSeq.sortBy(_._1).map { case (id, c) =>
        s"col\t$id\t${c.ndv}\t${c.avgLen}\t${c.maxLen}"
      }
    val tmp = dir.resolve(FileName + ".inprogress")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, dir.resolve(FileName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dir: Path): Option[AnalyzedStats] = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) None
    else {
      var version = -1
      val cols = Map.newBuilder[Long, AnalyzedCol]
      Files.readString(f).split("\n").iterator.filter(_.nonEmpty).foreach {
        line =>
          line.split("\t") match {
            case Array("version", v) => version = v.toInt
            case Array("col", id, ndv, avg, max) =>
              cols += id.toLong -> AnalyzedCol(ndv.toLong, avg.toLong,
                max.toLong)
            case other => throw new IllegalStateException(
              s"corrupt $FileName line: ${other.mkString("\t")}")
          }
      }
      require(version >= 0, s"corrupt $FileName: missing version line")
      Some(AnalyzedStats(version, cols.result()))
    }
  }
}
