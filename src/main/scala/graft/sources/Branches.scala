package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** NAMED WRITABLE BRANCHES (the Iceberg branch model, the production
  * write-audit-publish surface) over the per-table commit log:
  *
  *  - `ALTER TABLE cat.t CREATE BRANCH dev [VERSION AS OF ref]` forks
  *    the table zero-copy ([[TableClone.cloneInto]]) into the hidden
  *    `.branches/<table>/<branch>` directory — O(files) hard links,
  *    never listed as a table.
  *  - The branch is a FULL TABLE HANDLE at `cat.t.branch_dev`
  *    (the Iceberg `branch_<name>` identifier convention): reads,
  *    writes, MERGE/UPDATE/DELETE, time travel — everything a table
  *    supports, isolated from `main`. `SELECT ... VERSION AS OF
  *    'dev'` on the base table serves the branch head too (tags
  *    resolve first; branch names are the fallback).
  *  - `ALTER TABLE cat.t MERGE BRANCH dev` fast-forwards the branch's
  *    audited suffix onto the table — atomic single-commit-point
  *    publication ([[TableClone.fastForwardFrom]]), refused loudly if
  *    the table moved since the fork (re-branch = rebase).
  *  - `ALTER TABLE cat.t DROP BRANCH dev` unlinks the branch
  *    directory. Link ownership means retention is NON-NEGOTIABLE by
  *    construction: VACUUM/OPTIMIZE on the base table unlink only the
  *    base's directory entries, and every inode a branch references
  *    lives until the branch itself drops — stronger than refusing
  *    the vacuum (BranchSpec pins a branch surviving a source
  *    OPTIMIZE + VACUUM).
  */
private[sources] object Branches {

  /** `cat.t.branch_<name>` identifier suffix. */
  val Prefix = "branch_"

  def dirOf(root: Path, table: String, branch: String): Path =
    root.resolve(".branches").resolve(table).resolve(branch)

  private def validName(b: String): Unit =
    require(b.nonEmpty && b.forall(c => c.isLetterOrDigit || c == '_' ||
      c == '-' || c == '.'),
      s"bad branch name '$b' (letters, digits, _, -, . only)")

  /** Fork `cat.table` at `ref` into branch `branch`. Returns the
    * forked version. */
  def create(spark: SparkSession, cat: String, table: String,
      branch: String, ref: Option[String]): Int = {
    validName(branch)
    val store = MaintenanceSql.storeFor(spark, cat, table)
    val log = store.commitLog.getOrElse(
      throw new UnsupportedOperationException(
        s"branches need a durable table: $cat.$table"))
    val root = log.rootDir.getParent
    val dir = dirOf(root, table, branch)
    require(!Files.exists(dir),
      s"branch '$branch' already exists on $cat.$table")
    Files.createDirectories(dir.getParent)
    TableClone.cloneInto(store, log, cat, table, ref, dir)
  }

  /** Publish the branch's audited suffix onto the base table
    * (fast-forward). Returns (base, head) published. The branch
    * stays in place (drop it, or keep auditing and re-branch). */
  def merge(spark: SparkSession, cat: String, table: String,
      branch: String): (Int, Int) = {
    val bs = storeOf(spark, cat, table, branch).getOrElse(
      throw new IllegalArgumentException(
        s"no branch '$branch' on $cat.$table"))
    TableClone.fastForwardFrom(spark, cat, table,
      s"$cat.$table@$branch", bs)
  }

  /** Unlink the branch: evict its cached store, destroy its
    * directory (hard links — the base table's files are untouched). */
  def drop(spark: SparkSession, cat: String, table: String,
      branch: String): Unit = {
    validName(branch)
    val root = MemCatalog.rootOf(spark, cat).getOrElse(
      throw new UnsupportedOperationException(
        s"branches need a durable catalog: $cat"))
    val dir = dirOf(root, table, branch)
    require(CommitLog.existsAt(dir), s"no branch '$branch' on $cat.$table")
    MemCatalog.invalidateBranch(cat, table, branch)
    CommitLog.destroy(dir)
    // clean the per-table container when the last branch drops
    val parent = dir.getParent
    val left = Files.list(parent)
    try { if (!left.iterator().hasNext) Files.deleteIfExists(parent) }
    finally left.close()
  }

  /** Live branch names of `cat.table` (on-disk scan — O(branches)). */
  def list(spark: SparkSession, cat: String, table: String): Seq[String] =
    MemCatalog.rootOf(spark, cat).toSeq.flatMap { root =>
      val parent = root.resolve(".branches").resolve(table)
      if (!Files.isDirectory(parent)) Seq.empty
      else {
        val s = Files.list(parent)
        try {
          val out = Vector.newBuilder[String]
          val it = s.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (CommitLog.existsAt(p)) out += p.getFileName.toString
          }
          out.result().sorted
        } finally s.close()
      }
    }

  /** The branch's store, loaded (and cached) like any table store. */
  def storeOf(spark: SparkSession, cat: String, table: String,
      branch: String): Option[MemStore] =
    MemCatalog.rootOf(spark, cat).flatMap(root =>
      MemCatalog.branchStore(root, cat, table, branch))
}
