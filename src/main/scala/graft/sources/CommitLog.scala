package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{DataType, StructType}

/** Durable snapshot log for [[MemCatalog]] tables — the Delta/Iceberg
  * commit-log shape in miniature: a per-table directory holding
  * `_schema.json` plus one IMMUTABLE numbered commit file per
  * append/replace, each written to a temp sibling and moved into
  * place atomically (the [[graft.operators.IndexStore]] single-writer
  * discipline), so a reader never observes a half-written commit and
  * a process restart replays the exact version history — `VERSION AS
  * OF n` and MERGE survive the JVM.
  *
  * Rows are encoded as [[UnsafeRow]] bytes (schema-agnostic, the same
  * format Tungsten shuffles), length-prefixed inside each commit
  * file. Commit files are append-only and never rewritten — version n
  * is reconstructed by folding commits 1..n over the empty version 0,
  * exactly how a lakehouse log replays snapshots (retention would
  * prune the prefix and checkpoint it; at fixture scale the full fold
  * is cheap).
  */
private[sources] final class CommitLog(dir: Path, val schema: StructType) {

  private def commitFile(version: Int): Path =
    dir.resolve(f"$version%08d.commit")

  // callers serialize record() (MemStore's synchronized commits), so
  // one cached projection is safe
  private lazy val proj = UnsafeProjection.create(schema)

  /** Persist one commit (version >= 1) stamped with its commit time
    * (epoch micros — the `TIMESTAMP AS OF` resolution source).
    * Callers serialize commits (MemStore's synchronized
    * append/replace), matching the single-writer assumption of the
    * atomic move. */
  def record(version: Int, replace: Boolean, tsMicros: Long,
      rows: Seq[InternalRow]): Unit = {
    val tmp = dir.resolve(f"$version%08d.commit.inprogress")
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(tmp, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING)))
    try {
      out.writeByte(if (replace) 1 else 0)
      out.writeLong(tsMicros)
      out.writeInt(rows.length)
      rows.foreach { r =>
        val bytes = proj(r).getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    } finally out.close()
    // REPLACE_EXISTING: expiry consolidates onto an existing file name
    Files.move(tmp, commitFile(version), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Table creation time (epoch micros) — version 0's timestamp. */
  def createdMicros: Long =
    Files.readString(dir.resolve("_created")).trim.toLong

  /** Snapshot EXPIRY (the Iceberg `expire_snapshots` / Delta
    * retention lever): consolidate version `before` into a
    * self-contained REPLACE commit (folding a replace needs no
    * predecessor), then delete every earlier commit file. Ordering is
    * crash-safe: the consolidated file lands first (replacing the old
    * file atomically — replaying it yields the identical state, so a
    * crash mid-expiry only leaves extra, still-valid prefix files). */
  def expireBefore(version: Int, tsMicros: Long,
      rows: Seq[InternalRow]): Unit = {
    record(version, replace = true, tsMicros, rows)
    val files = Files.list(dir).iterator()
    val stale = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (files.hasNext) {
      val p = files.next()
      val n = p.getFileName.toString
      if (n.matches("\\d{8}\\.commit") && n.take(8).toInt < version) stale += p
    }
    stale.foreach(Files.delete)
  }

  /** Replay every retained commit in version order: (version,
    * replace?, commit micros, rows). After an expiry the first
    * retained commit is a self-contained replace with version > 1.
    * `.inprogress` leftovers from a crashed writer are ignored — only
    * atomically-moved commits are history. */
  def replay(): Seq[(Int, Boolean, Long, Vector[InternalRow])] = {
    val files = Files.list(dir).iterator()
    val commits = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (files.hasNext) {
      val p = files.next()
      if (p.getFileName.toString.matches("\\d{8}\\.commit")) commits += p
    }
    commits.sortBy(_.getFileName.toString).toSeq.map { p =>
      val ver = p.getFileName.toString.take(8).toInt
      val in = new DataInputStream(new BufferedInputStream(
        Files.newInputStream(p)))
      try {
        val replace = in.readByte() == 1
        val ts = in.readLong()
        val n = in.readInt()
        val rows = Vector.newBuilder[InternalRow]
        var i = 0
        while (i < n) {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val row = new UnsafeRow(schema.length)
          row.pointTo(bytes, len)
          rows += row
          i += 1
        }
        (ver, replace, ts, rows.result())
      } finally in.close()
    }
  }
}

private[sources] object CommitLog {

  private def schemaFile(dir: Path): Path = dir.resolve("_schema.json")

  def existsAt(dir: Path): Boolean = Files.exists(schemaFile(dir))

  /** Initialize a fresh log directory (schema written last, via temp +
    * atomic move, so `existsAt` implies a complete creation). */
  def create(dir: Path, schema: StructType, createdMicros: Long): CommitLog = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("_created"), createdMicros.toString)
    val tmp = dir.resolve("_schema.json.inprogress")
    Files.writeString(tmp, schema.json)
    Files.move(tmp, schemaFile(dir), StandardCopyOption.ATOMIC_MOVE)
    new CommitLog(dir, schema)
  }

  /** Open an existing log for replay after a restart. */
  def open(dir: Path): CommitLog = {
    val schema = DataType.fromJson(Files.readString(schemaFile(dir)))
      .asInstanceOf[StructType]
    new CommitLog(dir, schema)
  }

  def destroy(dir: Path): Unit =
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
