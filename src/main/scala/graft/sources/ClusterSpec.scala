package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** WRITE-TIME CLUSTERING (the Delta liquid-clustering idea in its
  * Spark-native form): `ALTER TABLE t SET CLUSTERED BY (c1, c2)`
  * records clustering columns, and every subsequent write DEMANDS a
  * range distribution + in-partition ordering from Spark through the
  * DSv2 `RequiresDistributionAndOrdering` contract — the engine
  * plans the exchange/sort, the writer just streams, and each landed
  * file covers a narrow, mostly non-overlapping range of the
  * clustering key. Per-file min/max stats then skip files on range
  * predicates from the FIRST insert, no OPTIMIZE pass needed — at
  * 100 TB that converts every ingest into pre-indexed layout for
  * free (one range exchange the write was going to pay anyway in a
  * clustered table).
  *
  * Columns are FIELD-ID keyed (survive RENAME COLUMN); `SET
  * CLUSTERED BY NONE` clears. OPTIMIZE with no explicit ZORDER list
  * defaults to the table's clustering columns, so maintenance
  * re-clusters along the same axis ingest does. */
private[sources] object ClusterSpec {

  val FileName = "_cluster"

  def write(dir: Path, ids: Vector[Long]): Unit = {
    val tmp = dir.resolve(FileName + ".inprogress")
    Files.writeString(tmp, ids.mkString("\n"))
    Files.move(tmp, dir.resolve(FileName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dir: Path): Vector[Long] = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) Vector.empty
    else Files.readString(f).split("\n").iterator.filter(_.nonEmpty)
      .map(_.toLong).toVector
  }
}
