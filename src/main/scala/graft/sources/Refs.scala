package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** NAMED REFS (tags) — the Iceberg tag model over the catalog's
  * linear commit log: a tag is an immutable name → version pointer.
  * Tags make time travel HUMAN (read `VERSION AS OF 'prod-2026-08'`
  * instead of memorizing version numbers), anchor reproducibility
  * (an ML training run tags the exact snapshot it consumed — at
  * 100 TB you cannot copy the data, only pin it), and PROTECT their
  * snapshot from expiry: `VACUUM`/`expireSnapshots` refuses to drop a
  * tagged version until the tag is dropped — loud, never a silently
  * resurrected pointer to vanished files.
  *
  * Persisted as the `_refs` sidecar (atomic rewrite, replayed at
  * open, travels with `ALTER TABLE RENAME TO` since the whole log
  * directory moves). Tag names must start with a letter/underscore —
  * never purely numeric — so `VERSION AS OF` strings stay
  * unambiguous: digits = version, otherwise = tag.
  */
private[sources] object Refs {

  val FileName = "_refs"

  private val NameRe = "^[A-Za-z_][A-Za-z0-9_.\\-]*$".r

  def validName(name: String): Boolean = NameRe.matches(name)

  def write(dir: Path, refs: Map[String, Int]): Unit = {
    val lines = refs.toSeq.sortBy(_._1).map { case (n, v) => s"tag\t$n\t$v" }
    val tmp = dir.resolve(FileName + ".inprogress")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, dir.resolve(FileName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dir: Path): Map[String, Int] = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) Map.empty
    else Files.readString(f).split("\n").iterator.filter(_.nonEmpty).map {
      line =>
        line.split("\t") match {
          case Array("tag", n, v) => n -> v.toInt
          case other => throw new IllegalStateException(
            s"corrupt $FileName line: ${other.mkString("\t")}")
        }
    }.toMap
  }
}
