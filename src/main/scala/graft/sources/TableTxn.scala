package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** MULTI-TABLE ATOMIC TRANSACTIONS — one commit spanning several
  * catalog tables: a corpus and its index artifacts advance TOGETHER
  * or not at all (the cross-table guarantee single-log formats like
  * Delta lack and Iceberg delegates to an external catalog; here it
  * rides a write-ahead manifest over the per-table commit logs).
  *
  * Usage (programmatic; each write opts in with the txn id option):
  * {{{
  *   MemCatalog.inTransaction(spark, "cat") { txn =>
  *     corpusDf.writeTo("cat.corpus")
  *       .option("graft.txn.id", txn.id).append()
  *     indexDf.writeTo("cat.index")
  *       .option("graft.txn.id", txn.id).append()
  *   }
  * }}}
  *
  * Protocol (write-ahead manifest, roll-back on incompleteness):
  *
  *  1. During the body, each participating write runs its normal
  *     distributed write tasks — data files stream to the tables'
  *     data directories (invisible until referenced) — but the COMMIT
  *     parks the file refs under the txn instead of publishing.
  *  2. On body success the coordinator takes every participant's
  *     store monitor in a canonical (sorted) order — no same-JVM
  *     writer can interleave — captures each table's next version,
  *     and writes the MANIFEST `.txn/<id>.pending` (atomic move)
  *     listing `(table, version)` legs: the write-ahead record.
  *  3. Each leg publishes at EXACTLY its recorded version
  *     ([[MemStore.commitFilesAt]] — occupied slot = loud conflict).
  *  4. The manifest deletes: the transaction is complete.
  *
  * Crash recovery ([[TableTxn.recover]], run before any table of the
  * catalog root loads): a `.pending` manifest whose legs ALL landed
  * is complete (delete the manifest); one with ANY leg missing rolls
  * BACK — landed legs' commit + stats files delete, so every
  * participant returns to its pre-txn version. Sound because nothing
  * can build on a landed leg before recovery runs: same-JVM writers
  * were excluded by the monitors at crash time, and a restart runs
  * recovery before serving any store. (A cross-process writer racing
  * the crash window could in principle extend a landed leg first —
  * the same single-writer-per-table deployment caveat the
  * fast-forward publication documents.)
  *
  * A body exception aborts: parked (uncommitted) data files delete
  * eagerly, no manifest was ever written, both tables stay put. */
final class TableTxn private[sources] (val id: String,
    private[sources] val catalogName: String) {
  private[sources] val parked =
    new java.util.concurrent.ConcurrentHashMap[MemStore,
      (Vector[FileRef], CommitStats)]()

  private[sources] def park(store: MemStore, refs: Seq[FileRef],
      cs: CommitStats): Unit =
    parked.merge(store, (refs.toVector, cs), (a, b) =>
      (a._1 ++ b._1, CommitStats.merge(a._2, b._2)))
}

private[sources] object TableTxn {

  private def txnDir(root: Path): Path = root.resolve(".txn")

  /** Per-root mutex serializing COMMIT (manifest write → legs →
    * manifest delete) against RECOVERY: without it a cold loadTable
    * of ANY table under the same root, landing while a live commit
    * sits between manifest publish and manifest delete, would read
    * the manifest, see legs still missing, and roll back commits the
    * coordinator is still publishing. Keyed on the normalized root so
    * every spelling of the same directory shares one lock. */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[Path, Object]()
  private[sources] def withRootLock[A](root: Path)(f: => A): A =
    rootLocks.computeIfAbsent(root.toAbsolutePath.normalize,
      _ => new Object).synchronized(f)

  /** Root-relative table directory of a participant store — multi
    * segment for a branch store (`.branches/<table>/<branch>`), one
    * segment for a plain table. Recorded verbatim in the manifest so
    * recovery resolves the SAME directory the leg committed into. */
  private def relDirOf(root: Path, store: MemStore): Path = {
    val tdir = java.nio.file.Paths.get(store.dataDirStr.get).getParent
      .toAbsolutePath.normalize
    root.toAbsolutePath.normalize.relativize(tdir)
  }

  /** The marker a leg commit carries (modified-UTF8 in the commit's
    * txn tail) — recovery matches it byte-wise to tell OUR landed
    * legs apart from a foreign commit occupying the slot. */
  private def tag(id: String): String = "graft-txn:" + id

  /** Run `body` as one atomic multi-table transaction (see class
    * doc). Returns the body's value on commit. */
  def inTransaction[A](spark: SparkSession, catalogName: String)
      (body: TableTxn => A): A = {
    val root = MemCatalog.rootOf(spark, catalogName).getOrElse(
      throw new UnsupportedOperationException(
        s"transactions need a durable catalog (path option): $catalogName"))
    val txn = new TableTxn(
      java.util.UUID.randomUUID().toString.take(12), catalogName)
    MemCatalog.registerTxn(txn)
    val result =
      try body(txn)
      catch {
        case t: Throwable =>
          abort(txn)
          MemCatalog.unregisterTxn(txn)
          throw t
      }
    try commit(root, txn)
    finally MemCatalog.unregisterTxn(txn)
    result
  }

  private def abort(txn: TableTxn): Unit = {
    // parked data files are uncommitted strays: delete them eagerly
    // (the vacuum grace window would otherwise hold them for a day)
    txn.parked.forEach { (store, legs) =>
      store.dataDirStr.foreach(dir => legs._1.foreach(f =>
        Files.deleteIfExists(java.nio.file.Paths.get(dir, f.name))))
    }
  }

  private def commit(root: Path, txn: TableTxn): Unit = {
    import scala.jdk.CollectionConverters._
    val parts = txn.parked.asScala.toVector
      .sortBy(_._1.dataDirStr.getOrElse(""))
    if (parts.isEmpty) return
    require(parts.forall(_._1.dataDirStr.isDefined),
      "transactions span durable tables only")
    // canonical lock order = sorted data dirs: no deadlock with a
    // concurrent transaction over the same tables
    def locked[B](rest: Vector[MemStore])(f: => B): B = rest match {
      case s +: tail => s.synchronized(locked(tail)(f))
      case _ => f
    }
    locked(parts.map(_._1)) { withRootLock(root) {
      val legs = parts.map { case (store, (refs, cs)) =>
        (store, refs, cs, store.currentVersion + 1)
      }
      // WRITE-AHEAD MANIFEST: (root-relative table dir, version) per
      // leg — multi-segment for branch participants, so recovery
      // resolves root/.branches/<t>/<b>, never a phantom root/<b>
      val dir = txnDir(root)
      Files.createDirectories(dir)
      val tmp = dir.resolve(txn.id + ".inprogress")
      val body = legs.map { case (store, _, _, v) =>
        relDirOf(root, store).toString + "\t" + v
      }.mkString("\n")
      Files.writeString(tmp, body, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING)
      val manifest = dir.resolve(txn.id + ".pending")
      Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE)
      try {
        legs.foreach { case (store, refs, cs, v) =>
          store.commitFilesAt(v, refs, cs, Some(tag(txn.id)))
        }
      } catch {
        case t: Throwable =>
          // a leg lost its slot (cross-process racer): roll back the
          // already-landed legs — the manifest makes this the same
          // cleanup a crash recovery would run — and drop the cached
          // stores whose in-memory state ran ahead of the reverted log
          recoverManifest(root, manifest)
          legs.foreach { case (store, _, _, _) =>
            MemCatalog.invalidateByRelDir(txn.catalogName,
              relDirOf(root, store))
          }
          throw new java.util.ConcurrentModificationException(
            s"transaction ${txn.id} aborted: a participant's version " +
              s"slot was taken concurrently ($t); all legs rolled back")
      }
      // commit point passed (all legs landed): the txn is durable —
      // NOW the legs' deferred checkpoints may be taken
      Files.deleteIfExists(manifest)
      legs.foreach { case (store, _, _, _) => store.checkpointIfDue() }
    } }
  }

  /** Crash recovery for one catalog root: complete or roll back every
    * pending manifest (see class doc). Idempotent; called before any
    * table of the root loads into this JVM. */
  def recover(root: Path): Unit = withRootLock(root) {
    val dir = txnDir(root)
    if (!Files.isDirectory(dir)) {
      TableClone.recoverPendingFastForwards(root)
      return
    }
    val stream = Files.list(dir)
    val pending = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        // a manifest (or staged manifest) of a txn LIVE in this JVM is
        // not a crash residue: the coordinator is between manifest
        // publish and delete — leave it to finish (the root lock
        // already excludes that window for callers that honor it; the
        // id check also covers re-entrant recovery during the commit)
        def live(id: String): Boolean = MemCatalog.txnFor(id).isDefined
        if (n.endsWith(".pending")) {
          if (!live(n.stripSuffix(".pending"))) pending += p
        } else if (n.endsWith(".inprogress")) {
          if (!live(n.stripSuffix(".inprogress"))) Files.deleteIfExists(p)
        }
      }
    } finally stream.close()
    pending.foreach(m => recoverManifest(root, m))
    TableClone.recoverPendingFastForwards(root)
  }

  private def recoverManifest(root: Path, manifest: Path): Unit = {
    if (!Files.exists(manifest)) return
    val txnId = manifest.getFileName.toString.stripSuffix(".pending")
    val marker = tag(txnId).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val legs = Files.readString(manifest).split("\n").toVector
      .filter(_.nonEmpty).map { line =>
        val Array(tbl, v) = line.split("\t")
        (tbl, v.toInt)
      }
    def commitFile(tbl: String, v: Int): Path =
      root.resolve(tbl).resolve(f"$v%08d.commit")
    // OUR landed legs only: the slot may instead hold a FOREIGN
    // commit (a racer won it before we crashed/aborted) — that one is
    // real history and must never be touched. Leg commits carry the
    // txn tag in their commit bytes (commit files are O(refs) small).
    def ours(p: Path): Boolean = {
      val bytes = Files.readAllBytes(p)
      bytes.indexOfSlice(marker) >= 0
    }
    val landedOurs = legs.filter { case (t, v) =>
      val p = commitFile(t, v)
      Files.exists(p) && ours(p)
    }
    if (landedOurs.length < legs.length) {
      // incomplete: roll BACK our landed legs (commit + stats files);
      // their data files become unreferenced strays the next vacuum
      // reclaims past the grace window
      landedOurs.foreach { case (t, v) =>
        Files.deleteIfExists(commitFile(t, v))
        Files.deleteIfExists(root.resolve(t).resolve(f"$v%08d.stats"))
      }
    } // else: complete — every leg landed; just clear the manifest
    Files.deleteIfExists(manifest)
  }
}
