package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** SHALLOW CLONE + FAST FORWARD — the catalog's WRITE-AUDIT-PUBLISH
  * primitives (Delta `SHALLOW CLONE`, Iceberg branch + `fast_forward`
  * re-expressed over the linear commit log):
  *
  *   - `CREATE TABLE cat.dst SHALLOW CLONE cat.src [VERSION AS OF
  *     (v | 'tag')]` forks a table WITHOUT copying data: the clone's
  *     log directory is the source's log TRUNCATED at the cloned
  *     version — commit files (immutable once published) and parquet
  *     data files are HARD-LINKED, so the fork is O(files) metadata
  *     operations regardless of table size. Links give STRICT
  *     ownership: each table's files are its own directory entries
  *     over shared inodes — VACUUM/OPTIMIZE on either side unlinks
  *     only its own entries and an inode lives until BOTH release it,
  *     so neither Delta's "vacuuming the source breaks shallow
  *     clones" hazard nor any cross-table reference exists. (An
  *     object-store deployment has no hard links; there this becomes
  *     an absolute-path manifest à la Iceberg — same O(files) cost,
  *     with the documented source-retention caveat.)
  *
  *   - `ALTER TABLE cat.tgt FAST FORWARD TO cat.clone` publishes the
  *     clone's audited suffix back onto the target: new data files
  *     hard-link over, then each suffix commit file links under the
  *     target's log with CREATE-NEW semantics — the same optimistic
  *     linearization every writer uses, so a concurrent commit on the
  *     target loses the race loudly instead of silently interleaving.
  *     Fast-forward REQUIRES the target unmoved since the clone
  *     (`currentVersion == clone base`) — the WAP contract: audit a
  *     fork of exactly what production serves, publish atomically, or
  *     re-clone if production moved. Clone history below the base is
  *     byte-identical to the target's by construction, so the
  *     published log replays as if the suffix had been committed on
  *     the target directly (row-delta positions address the same live
  *     ordering). Suffixes carrying schema or partition-spec changes
  *     are refused loudly — apply those on the target itself.
  */
private[sources] object TableClone {

  private val ProvenanceFile = "_clone"

  /** Fork `cat.src` at `ref` (version number or tag; default the
    * current version) into a new table `dst`. Returns the cloned
    * version. */
  def shallowClone(spark: SparkSession, cat: String, src: String,
      dst: String, ref: Option[String]): Int = {
    val srcStore = MaintenanceSql.storeFor(spark, cat, src)
    val srcLog = srcStore.commitLog.getOrElse(
      throw new UnsupportedOperationException(
        "SHALLOW CLONE needs a durable catalog table (path option) — " +
          "a heap table has no files to link"))
    val dstDir = srcLog.rootDir.getParent.resolve(dst)
    require(!Files.exists(dstDir),
      s"table $cat.$dst already exists at $dstDir")
    require(MemCatalog.storeOf(cat, dst).isEmpty,
      s"table $cat.$dst is already loaded in this JVM")
    val v = cloneInto(srcStore, srcLog, cat, src, ref, dstDir)
    // materialize through the session catalog (replays the new log)
    spark.table(s"$cat.$dst").queryExecution.analyzed
    v
  }

  /** The zero-copy fork itself (shared by SHALLOW CLONE and CREATE
    * BRANCH): links `src`'s retained prefix at `ref` into `dstDir`,
    * staged + one atomic publish move. Returns the forked version. */
  private[sources] def cloneInto(srcStore: MemStore, srcLog: CommitLog,
      cat: String, src: String, ref: Option[String],
      dstDir: Path): Int = {
    val v = ref.map(srcStore.resolveVersion)
      .getOrElse(srcStore.currentVersion)
    require(v >= srcStore.oldestVersion && v <= srcStore.currentVersion,
      s"SHALLOW CLONE at version $v: retained window is " +
        s"[${srcStore.oldestVersion}, ${srcStore.currentVersion}]")

    // STAGED build + one ATOMIC_MOVE publish (the staged-CTAS publish
    // shape): `existsAt` (schema file present) must imply a COMPLETE
    // table, so nothing may appear under the final name until every
    // link and sidecar is in place — a crash mid-clone leaves only an
    // invisible `.staging/` residue, never a half-table a concurrent
    // loadTable could misread.
    val stagingDir = srcLog.rootDir.getParent.resolve(".staging").resolve(
      dstDir.getFileName.toString + "-clone-" +
        java.util.UUID.randomUUID().toString.take(8))
    Files.createDirectories(stagingDir.resolve("data"))
    try {
      val created = srcLog.rootDir.resolve("_created")
      if (Files.exists(created))
        Files.copy(created, stagingDir.resolve("_created"))
      // schema + spec registry AS OF the cloned version (commits <= v
      // decode under them exactly as the source's time travel does)
      CommitLog.writeSchemaFile(stagingDir, srcStore.physSchemaAt(v))
      CommitLog.writePartitionFile(stagingDir, srcStore.specsAt(v))
      // commit + stats files of the retained prefix: hard links
      // (immutable once published). No checkpoints: the clone's cold
      // load replays its commits and re-seeds its own.
      (math.max(1, srcStore.oldestVersion) to v).foreach { w =>
        val cf = srcLog.commitFilePath(w)
        require(Files.exists(cf), s"missing commit file $cf — the source " +
          "expired concurrently; re-run the clone")
        Files.createLink(stagingDir.resolve(cf.getFileName), cf)
        val sf = srcLog.statsFilePath(w)
        if (Files.exists(sf))
          Files.createLink(stagingDir.resolve(sf.getFileName), sf)
      }
      // every data file links over (a superset of those referenced <= v
      // is harmless: links are free and each table owns its own entries)
      val ds = Files.list(srcLog.dataDir)
      try {
        val it = ds.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (Files.isRegularFile(p))
            Files.createLink(
              stagingDir.resolve("data").resolve(p.getFileName), p)
        }
      } finally ds.close()
      // sidecars, truncated to what exists at v: tags at or below v;
      // constraints whose columns exist at v; ANALYZE stats unless they
      // describe a later version
      val tags = srcStore.refs.filter(_._2 <= v)
      if (tags.nonEmpty) Refs.write(stagingDir, tags)
      val physV = srcStore.physSchemaAt(v)
      val idsAtV = physV.fields.flatMap(ColumnMapping.fieldId).toSet
      val namesAtV = ColumnMapping.logical(physV).fieldNames.toSet
      val c = srcStore.constraints
      val kept = TableConstraints(
        c.notNullIds.intersect(idsAtV),
        c.checks.filter(ch => Constraints.references(ch.sql)
          .subsetOf(namesAtV)))
      if (!kept.isEmpty) Constraints.write(stagingDir, kept)
      srcStore.analyzedStats.filter(_.version <= v)
        .foreach(s => AnalyzedColStats.write(stagingDir, s))
      // provenance: what FAST FORWARD validates against
      Files.writeString(stagingDir.resolve(ProvenanceFile),
        s"$cat\t$src\t$v")
      // PUBLISH: one atomic rename — the table either exists complete
      // or not at all (move refuses if dst appeared concurrently)
      Files.move(stagingDir, dstDir,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case t: Throwable =>
        CommitLog.destroy(stagingDir)
        throw t
    }
    v
  }

  /** Publish `cat.clone`'s suffix commits onto `cat.tgt` (its clone
    * source). Returns (base version, head version) published. */
  def fastForward(spark: SparkSession, cat: String, tgt: String,
      clone: String): (Int, Int) =
    fastForwardFrom(spark, cat, tgt, s"$cat.$clone",
      MaintenanceSql.storeFor(spark, cat, clone))

  /** The publication core, clone store given explicitly — shared by
    * table clones and BRANCHES ([[Branches.merge]]). */
  private[sources] def fastForwardFrom(spark: SparkSession, cat: String,
      tgt: String, cloneLabel: String, c: MemStore): (Int, Int) = {
    val t = MaintenanceSql.storeFor(spark, cat, tgt)
    val tLog = t.commitLog.getOrElse(throw new UnsupportedOperationException(
      s"FAST FORWARD target $cat.$tgt is not a durable table"))
    val cLog = c.commitLog.getOrElse(throw new UnsupportedOperationException(
      s"FAST FORWARD source $cloneLabel is not a durable table"))
    val prov = cLog.rootDir.resolve(ProvenanceFile)
    require(Files.exists(prov),
      s"$cloneLabel is not a shallow clone (no $ProvenanceFile provenance)")
    val parts = Files.readString(prov).trim.split("\t")
    require(parts.length == 3, s"corrupt $ProvenanceFile: ${parts.toSeq}")
    require(parts(0) == cat && parts(1) == tgt,
      s"$cloneLabel was cloned from ${parts(0)}.${parts(1)}, " +
        s"not $cat.$tgt — fast-forward publishes only onto the clone source")
    val base = parts(2).toInt
    if (t.currentVersion != base)
      throw new java.util.ConcurrentModificationException(
        s"FAST FORWARD refused: $cat.$tgt is at version " +
          s"${t.currentVersion}, the clone forked at $base — the target " +
          "moved; re-clone and re-apply the audit writes")
    val head = c.currentVersion
    require(head > base,
      s"nothing to publish: $cloneLabel has no commits past its base $base")
    c.deltasAfter(base).foreach {
      case VMarker | _: VSpecChange =>
        throw new UnsupportedOperationException(
          "FAST FORWARD suffix contains schema or partition-spec " +
            "changes — apply those on the target directly, then re-clone")
      case _ => ()
    }
    // new data files first (invisible until a commit references them)
    val ds = Files.list(cLog.dataDir)
    try {
      val it = ds.iterator()
      while (it.hasNext) {
        val p = it.next()
        val dst = tLog.dataDir.resolve(p.getFileName)
        if (Files.isRegularFile(p) && !Files.exists(dst))
          try Files.createLink(dst, p)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
    } finally ds.close()
    // SINGLE-COMMIT-POINT publication: replay stops at the first
    // missing version, so versions base+2..head link FIRST (invisible
    // — base+1 is absent) and base+1 links LAST as the one atomic
    // commit point: the whole suffix appears at once or not at all.
    // The target store's monitor is held across the loop so no
    // same-JVM writer can land base+1 (and then trip over an orphan
    // base+2) mid-publication; a cross-process racer landing base+1
    // first makes our final link fail, and the invisible orphans roll
    // back before anyone can observe them.
    //
    // CRASH SAFETY: a PENDING MARKER (`.txn/<id>.ffpending`, the same
    // write-ahead discipline as [[TableTxn]]) records every suffix
    // file's content hash BEFORE the first link. A crash inside the
    // window leaves the marker; load-time recovery
    // ([[recoverPendingFastForwards]]) then either confirms the
    // publication complete (all hashes match) or deletes exactly the
    // orphan links whose bytes match the marker — so an orphan suffix
    // can never silently become table history after an unrelated
    // write lands base+1.
    val root = tLog.rootDir.getParent
    val relTgt = root.toAbsolutePath.normalize
      .relativize(tLog.rootDir.toAbsolutePath.normalize).toString
    t.synchronized { TableTxn.withRootLock(root) {
      if (t.currentVersion != base)
        throw new java.util.ConcurrentModificationException(
          s"FAST FORWARD refused: $cat.$tgt moved to version " +
            s"${t.currentVersion} during publication prep; re-clone")
      val marker = writeFFMarker(root, relTgt, base, head, cLog)
      val linked = Vector.newBuilder[Path]
      def linkStats(w: Int): Unit = {
        val sf = cLog.statsFilePath(w)
        if (Files.exists(sf) && !Files.exists(tLog.statsFilePath(w))) {
          Files.createLink(tLog.statsFilePath(w), sf)
          linked += tLog.statsFilePath(w)
        }
      }
      try {
        (base + 2 to head).foreach { w =>
          linkStats(w)
          Files.createLink(tLog.commitFilePath(w), cLog.commitFilePath(w))
          linked += tLog.commitFilePath(w)
        }
        linkStats(base + 1)
        Files.createLink(tLog.commitFilePath(base + 1),
          cLog.commitFilePath(base + 1))
        Files.deleteIfExists(marker) // publication complete
      } catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          // a racer won a version slot: unpublish the (still
          // invisible) suffix and abort loudly — nothing partial
          // remains
          linked.result().reverse.foreach(p =>
            try Files.deleteIfExists(p) catch { case _: Exception => () })
          Files.deleteIfExists(marker)
          throw new java.util.ConcurrentModificationException(
            s"FAST FORWARD aborted: a version landed on $cat.$tgt " +
              s"concurrently ($e); the suffix was rolled back — " +
              "re-clone and re-apply the audit writes")
      }
    } }
    // surface the published suffix: drop the cached store, replay
    MemCatalog.invalidate(cat, tgt)
    spark.table(s"$cat.$tgt").queryExecution.analyzed
    (base, head)
  }

  // ---- fast-forward crash recovery -----------------------------------

  private def sha256(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(Files.readAllBytes(p))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Write the fast-forward pending marker (staged + atomic move):
    * one header line `tgtDir\tbase\thead`, then per suffix version
    * `v\t<commit sha256>\t<stats sha256 | ->`. The hashes let
    * recovery distinguish OUR links from a foreign commit occupying
    * the same slot — only byte-identical files ever roll back. */
  private def writeFFMarker(root: Path, relTgt: String, base: Int,
      head: Int, cLog: CommitLog): Path = {
    val dir = root.resolve(".txn")
    Files.createDirectories(dir)
    val id = "ff-" + java.util.UUID.randomUUID().toString.take(12)
    val body = new StringBuilder
    body ++= s"$relTgt\t$base\t$head\n"
    (base + 1 to head).foreach { w =>
      val cs = sha256(cLog.commitFilePath(w))
      val sf = cLog.statsFilePath(w)
      val ss = if (Files.exists(sf)) sha256(sf) else "-"
      body ++= s"$w\t$cs\t$ss\n"
    }
    val tmp = dir.resolve(id + ".inprogress")
    Files.writeString(tmp, body.result())
    val marker = dir.resolve(id + ".ffpending")
    Files.move(tmp, marker,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    marker
  }

  /** Load-time recovery for fast-forward publications that crashed
    * between the marker write and the marker delete (called by
    * [[TableTxn.recover]] under the per-root lock). Complete
    * publications (every recorded hash present and matching) just
    * clear the marker; anything else deletes exactly the orphan
    * links whose bytes match the marker's hashes — a foreign commit
    * that won a slot never matches and is never touched. */
  private[sources] def recoverPendingFastForwards(root: Path): Unit = {
    val dir = root.resolve(".txn")
    if (!Files.isDirectory(dir)) return
    val stream = Files.list(dir)
    val markers = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".ffpending")) markers += p
      }
    } finally stream.close()
    markers.foreach { m =>
      val lines = Files.readString(m).split("\n").toVector
        .filter(_.nonEmpty)
      val Array(relTgt, baseS, headS) = lines.head.split("\t")
      val base = baseS.toInt
      val head = headS.toInt
      val tgtDir = root.resolve(relTgt)
      val rec: Map[Int, (String, String)] = lines.tail.map { l =>
        val Array(v, cs, ss) = l.split("\t")
        v.toInt -> (cs, ss)
      }.toMap
      def commitFile(v: Int) = tgtDir.resolve(f"$v%08d.commit")
      def statsFile(v: Int) = tgtDir.resolve(f"$v%08d.stats")
      def commitMatches(v: Int): Boolean = {
        val p = commitFile(v)
        Files.exists(p) && rec.get(v).exists(_._1 == sha256(p))
      }
      val complete = (base + 1 to head).forall(commitMatches)
      if (!complete) {
        (base + 1 to head).foreach { v =>
          if (commitMatches(v)) Files.deleteIfExists(commitFile(v))
          val sp = statsFile(v)
          if (Files.exists(sp) &&
              rec.get(v).exists(r => r._2 != "-" && r._2 == sha256(sp)))
            Files.deleteIfExists(sp)
        }
      }
      Files.deleteIfExists(m)
    }
  }
}
