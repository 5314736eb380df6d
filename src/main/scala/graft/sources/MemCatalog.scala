package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference,
  Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder,
  DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  SupportsDelta, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSource-v2 catalog whose tables support DELTA-BASED
  * row-level operations — the `SupportsDelta` contract lakehouse
  * formats (Iceberg position-delete class) implement — so literal ANSI
  * `MERGE INTO` / `UPDATE` / `DELETE FROM` SQL executes against a
  * registered table through Spark's own `RewriteMergeIntoTable` /
  * `WriteDelta` planning and COMMITS O(delta), not O(table): the scan
  * exposes a `__pos` row-id metadata column, the writer receives only
  * the deleted/updated/inserted rows, and the durable commit file
  * holds exactly that delta. Register with
  * `spark.sql.catalog.<name> = graft.sources.MemCatalog`.
  *
  * Storage is in-memory (a JVM-wide store keyed by catalog+identifier)
  * — the point is the CONNECTOR SURFACE, not persistence: q194 drives
  * the q135 CDC changelog through real `MERGE INTO` text and compares
  * against the same DuckDB oracle, proving a migrating warehouse user
  * can keep their MERGE statements. At 100 TB the delta protocol is
  * the difference between a MERGE touching a handful of rows writing
  * kilobytes versus rewriting the corpus — the earlier group-based
  * (copy-on-write, whole-table-as-one-group) implementation did the
  * latter on every row-level commit.
  */
class MemCatalog extends TableCatalog {

  private var catalogName: String = _

  private var logRoot: Option[java.nio.file.Path] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    logRoot = Option(options.get("path"))
      .map(p => java.nio.file.Paths.get(p))
  }

  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    catalogName + "\u0000" + ident.toString

  /** Per-table durable log directory (identifier sanitized for the
    * fs); None when the catalog runs purely in-memory. */
  private def logDir(ident: Identifier): Option[java.nio.file.Path] =
    logRoot.map(_.resolve(ident.toString.replaceAll("[^A-Za-z0-9._-]", "_")))

  /** The live store: the JVM-cached one, else — durable catalogs only
    * — a replay of the on-disk commit log (the restart path). */
  private def liveStore(ident: Identifier): Option[MemStore] =
    MemCatalog.stores.get(key(ident)).orElse {
      logDir(ident).filter(CommitLog.existsAt).map { dir =>
        val replayed = MemStore.replayFrom(CommitLog.open(dir))
        MemCatalog.stores.putIfAbsent(key(ident), replayed)
        MemCatalog.stores(key(ident))
      }
    }

  /** In-memory tables plus — durable catalogs — any on-disk commit
    * log not yet loaded into this JVM, so `SHOW TABLES` is complete
    * straight after a restart. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val live = MemCatalog.stores.keys
      .filter(_.startsWith(catalogName + "\u0000"))
      .map(_.split("\u0000", 2)(1))
    val logged = logRoot.toSeq.flatMap { root =>
      if (!java.nio.file.Files.isDirectory(root)) Seq.empty
      else {
        val stream = java.nio.file.Files.list(root)
        val found = scala.collection.mutable.ArrayBuffer.empty[String]
        try {
          val it = stream.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (CommitLog.existsAt(p)) found += p.getFileName.toString
          }
        } finally stream.close()
        found.toSeq
      }
    }
    (live ++ logged).toSeq.distinct
      .map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadTable(ident: Identifier): Table =
    liveStore(ident) match {
      case Some(store) => new MemTable(ident.toString, store)
      case None => throw new NoSuchTableException(ident)
    }

  /** `VERSION AS OF n` time travel: serve the pinned historical
    * snapshot — the v2 connector hook Spark's TimeTravelSpec routes
    * version-qualified reads through. */
  override def loadTable(ident: Identifier, version: String): Table =
    liveStore(ident) match {
      case Some(store) =>
        new MemTable(s"${ident.toString}@v$version", store,
          Some((version.toInt, store.versionSnapshot(version.toInt))))
      case None => throw new NoSuchTableException(ident)
    }

  /** `TIMESTAMP AS OF t` time travel: Spark hands the resolved
    * timestamp in epoch MICROS; serve the newest snapshot committed
    * at or before it (commit times ride in the snapshot log, so this
    * works across restarts too). */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    liveStore(ident) match {
      case Some(store) =>
        val v = store.versionAt(timestamp)
        new MemTable(s"${ident.toString}@t$timestamp", store,
          Some((v, store.versionSnapshot(v))))
      case None => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "MemCatalog tables are unpartitioned")
    // A leftover durable log for this identifier IS the table (the
    // restart path) — resume its history rather than shadowing it.
    val store = liveStore(ident).getOrElse {
      val created = MemStore.nowMicros()
      val fresh = new MemStore(schema,
        logDir(ident).map(d => CommitLog.create(d, schema, created)),
        created)
      MemCatalog.stores.putIfAbsent(key(ident), fresh)
      MemCatalog.stores(key(ident))
    }
    new MemTable(ident.toString, store)
  }

  /** `ALTER TABLE ADD COLUMN` (append-only, nullable — the evolution
    * every format supports without rewriting history). Other changes
    * (drop/rename/retype) would need column-mapping metadata and stay
    * unsupported — loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val store = liveStore(ident).getOrElse(throw new NoSuchTableException(ident))
    val newSchema = changes.foldLeft(store.schema) {
      case (s, add: TableChange.AddColumn) =>
        require(add.fieldNames.length == 1,
          "MemCatalog.alterTable: nested ADD COLUMN unsupported")
        require(add.position == null,
          "MemCatalog.alterTable: positioned ADD COLUMN unsupported (append-only)")
        require(add.isNullable,
          "MemCatalog.alterTable: new columns must be nullable (history is not backfilled)")
        s.add(org.apache.spark.sql.types.StructField(
          add.fieldNames()(0), add.dataType(), nullable = true))
      case (_, other) => throw new UnsupportedOperationException(
        s"MemCatalog.alterTable: only ADD COLUMN is supported, got $other")
    }
    store.evolveSchema(newSchema)
    new MemTable(ident.toString, store)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val hadLog = logDir(ident) match {
      case Some(dir) if CommitLog.existsAt(dir) =>
        CommitLog.destroy(dir); true
      case _ => false
    }
    MemCatalog.stores.remove(key(ident)).isDefined || hadLog
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("MemCatalog.renameTable")
}

object MemCatalog {
  /** JVM-wide table stores — the catalog plugin is instantiated per
    * session, but local-mode executors and the driver share one JVM. */
  private val stores = TrieMap.empty[String, MemStore]

  /** TEST HOOK: drop every in-memory store, simulating a process
    * restart — durable tables must come back via commit-log replay,
    * purely in-memory ones must vanish. */
  private[graft] def simulateRestart(): Unit = stores.clear()

  /** Default durable-log root the gate surfaces point the catalog's
    * `path` option at (JVM prop override for test isolation). */
  def defaultRoot: String =
    sys.props.getOrElse("graft.catalog.store", "/tmp/graft_catalog")

  /** `DESCRIBE HISTORY`-shaped audit surface (the Delta convention):
    * one row per RETAINED version — (version, commit epoch micros,
    * row count at that version). Reads only in-memory metadata — the
    * per-version row counts are maintained incrementally, no snapshot
    * is materialized; after expiry the pruned prefix is absent. */
  def history(spark: org.apache.spark.sql.SparkSession, catalogName: String,
      table: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    stores.get(catalogName + "\u0000" + table) match {
      case Some(store) => store.historyRows
        .toDF("version", "commit_micros", "n_rows")
      case None => throw new IllegalArgumentException(
        s"history: $catalogName.$table is not loaded in this JVM")
    }
  }

  /** Snapshot retention (the Iceberg `expire_snapshots` lever): drop
    * every version before `before` for `catalog.table` — the commit
    * log consolidates the oldest retained version into a
    * self-contained commit and deletes the prefix, bounding replay
    * cost and storage by the retained window. Expired `VERSION AS OF`
    * / `TIMESTAMP AS OF` reads fail loudly afterwards. The table must
    * have been loaded in this JVM (load it once first). */
  def expireSnapshots(catalogName: String, table: String, before: Int): Unit =
    stores.get(catalogName + "\u0000" + table) match {
      case Some(store) => store.expireBefore(before)
      case None => throw new IllegalArgumentException(
        s"expireSnapshots: $catalogName.$table is not loaded in this JVM")
    }

  /** RESTORE (the Delta `RESTORE TABLE ... VERSION AS OF` rollback):
    * re-commit historical version `v`'s row set as a NEW replace
    * version. History is preserved — the rolled-back states stay
    * readable via time travel, exactly the lakehouse convention (a
    * restore is a forward commit, never a rewind). Stats re-seed from
    * the replace, so metadata-served aggregates stay exact. */
  def restoreSnapshot(catalogName: String, table: String, v: Int): Unit =
    stores.get(catalogName + "\u0000" + table) match {
      case Some(store) => store.replace(store.versionSnapshot(v).toSeq)
      case None => throw new IllegalArgumentException(
        s"restoreSnapshot: $catalogName.$table is not loaded in this JVM")
    }

  /** `table_changes(from, to)` (the Delta Change Data Feed surface):
    * every row changed in versions [from, to] with its change type and
    * commit version — `insert`, `delete`, `update_preimage` /
    * `update_postimage` — read straight off the retained delta
    * history ([[MemStore.changes]]). The downstream-sync primitive: a
    * consumer replaying the feed reconstructs the table without ever
    * re-scanning it. */
  def tableChanges(spark: org.apache.spark.sql.SparkSession,
      catalogName: String, table: String, fromV: Int,
      toV: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val store = stores.getOrElse(catalogName + "\u0000" + table,
      throw new IllegalArgumentException(
        s"tableChanges: $catalogName.$table is not loaded in this JVM"))
    val schema = store.schema
    val full = StructType(
      StructField("_change_type", StringType, nullable = false) +:
        StructField("_commit_version", LongType, nullable = false) +:
        schema.fields)
    def external(dt: DataType, v: Any): Any = (dt, v) match {
      case (_, null) => null
      case (StringType, u: org.apache.spark.unsafe.types.UTF8String) =>
        u.toString
      case (_: DecimalType, d: org.apache.spark.sql.types.Decimal) =>
        d.toJavaBigDecimal
      case _ => v // atomic internal == external (long/int/double/bool)
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      store.changes(fromV, toV).map { case (ct, ver, r) =>
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          if (i >= r.numFields || r.isNullAt(i)) null
          else external(f.dataType, r.get(i, f.dataType))
        }
        org.apache.spark.sql.Row.fromSeq(ct +: ver +: vals.toSeq)
      }.asJava
    spark.createDataFrame(rows, full)
  }
}

/** One retained version's content, stored AS ITS DELTA over the
  * previous version — the in-memory mirror of the commit-log entries,
  * so a MERGE that touches 3 rows retains 3 rows of history, never a
  * full row-vector snapshot per version (the r11 `weak`). The oldest
  * retained version is always a self-contained [[VBase]]; replay
  * composes. */
private[sources] sealed trait VDelta
private[sources] final case class VBase(rows: Vector[InternalRow])
  extends VDelta
private[sources] final case class VAppend(rows: Vector[InternalRow])
  extends VDelta
/** Positions index the PREVIOUS version's snapshot ordering. */
private[sources] final case class VRowDelta(deletes: Vector[Long],
    updates: Vector[(Long, InternalRow)], inserts: Vector[InternalRow])
  extends VDelta
/** Schema-change marker (rows identical to the previous version). */
private[sources] case object VMarker extends VDelta

private[sources] object VDelta {
  /** Apply one version delta to the previous snapshot. */
  def apply(prev: Vector[InternalRow], d: VDelta): Vector[InternalRow] =
    d match {
      case VBase(rows) => rows
      case VAppend(rows) => prev ++ rows
      case VMarker => prev
      case VRowDelta(deletes, updates, inserts) =>
        val del = deletes.toSet
        val upd = updates.toMap
        val b = Vector.newBuilder[InternalRow]
        var i = 0
        while (i < prev.length) {
          if (!del.contains(i.toLong))
            b += upd.getOrElse(i.toLong, prev(i))
          i += 1
        }
        b ++= inserts
        b.result()
    }
}

/** Mutable row store for one table. Writes are synchronized; readers
  * snapshot the CURRENT materialized row vector (immutable-copy
  * isolation, the snapshot-isolation a format gets from file
  * immutability). History is retained as one [[VDelta]] per version —
  * version 0 is the empty table at creation — so `VERSION AS OF n`
  * reads reconstruct exact historical snapshots by folding deltas from
  * the oldest retained [[VBase]], while the memory (and, for durable
  * tables, the on-disk commit) cost of a version is O(what changed):
  * the mechanism a lakehouse format gets from immutable data files
  * plus a delta log. */
private[sources] final class MemStore(schema0: StructType,
    log: Option[CommitLog] = None,
    createdMicros: Long = MemStore.nowMicros()) {
  // LATEST schema — ADD COLUMN evolves it append-only; historical rows
  // keep their original (prefix) arity and reads pad with NULLs (the
  // Delta AddColumn read behavior)
  @volatile private var curSchema: StructType = schema0
  def schema: StructType = curSchema
  // versions [base, base + entries.length): entries(i) is version
  // base + i; entries(0) is always a self-contained VBase.
  // base > 0 only after snapshot expiry pruned the prefix.
  @volatile private var base: Int = 0
  @volatile private var entries: Vector[VDelta] = Vector(VBase(Vector.empty))
  // the CURRENT snapshot, maintained incrementally (never re-folded)
  @volatile private var cur: Vector[InternalRow] = Vector.empty
  // commit time (epoch micros) per retained version; v0 = creation
  @volatile private var times: Vector[Long] = Vector(createdMicros)
  // row count per retained version (DESCRIBE HISTORY without folding)
  @volatile private var counts: Vector[Long] = Vector(0L)
  // snapshot stats per retained version (the fold of the commit-log
  // stats sidecars): None from the first commit whose sidecar is
  // missing until the next replace/delta re-seeds exact stats
  @volatile private var statsHist: Vector[Option[CommitStats]] =
    Vector(Some(CommitStats.empty(schema0)))
  def snapshot(): Array[InternalRow] = cur.toArray
  /** Reconstruct a historical snapshot by folding retained deltas —
    * O(retained window) per time-travel read, the price of O(delta)
    * version storage (a format pays the same shape: plan a historical
    * snapshot = resolve its live file set from the log). The LIVE
    * version is served from the materialized vector, never folded. */
  def versionSnapshot(v: Int): Array[InternalRow] = {
    require(v >= base,
      s"version $v expired — history is pruned before version $base")
    require(v <= currentVersion,
      s"version $v out of range [$base, $currentVersion]")
    if (v == currentVersion) cur.toArray
    else entries.slice(0, v - base + 1)
      .foldLeft(Vector.empty[InternalRow])(VDelta.apply).toArray
  }
  def currentVersion: Int = base + entries.length - 1
  def oldestVersion: Int = base
  /** Snapshot statistics for a retained version — the metadata that
    * serves COUNT/MIN/MAX without touching rows. None when any
    * contributing commit's sidecar was lost (reads fall back to a
    * scan). */
  def statsAt(v: Int): Option[CommitStats] = {
    require(v >= base && v <= currentVersion,
      s"version $v outside retained window [$base, $currentVersion]")
    statsHist(v - base)
  }
  /** `TIMESTAMP AS OF` resolution: the newest version committed at or
    * before `tsMicros` — the Delta/Iceberg convention; a timestamp
    * before the oldest RETAINED snapshot fails loudly. */
  def versionAt(tsMicros: Long): Int = {
    require(tsMicros >= times.head,
      s"timestamp $tsMicros predates the oldest retained snapshot " +
        s"(${times.head}, version $base)")
    base + times.lastIndexWhere(_ <= tsMicros)
  }
  // Durable catalogs write ahead: the commit file lands atomically
  // BEFORE the in-memory version advances, so a crash between the two
  // replays to a state the process never served stale.
  def append(r: Seq[InternalRow]): Unit = synchronized {
    val t = MemStore.nowMicros()
    log.foreach(_.record(currentVersion + 1, replace = false, t, r))
    val cs = CommitStats.of(r, curSchema)
    statsHist = statsHist :+ statsHist.last.map(CommitStats.merge(_, cs))
    cur = cur ++ r
    entries = entries :+ VAppend(r.toVector)
    counts = counts :+ cur.length.toLong
    times = times :+ t
  }
  def replace(r: Seq[InternalRow]): Unit = synchronized {
    val t = MemStore.nowMicros()
    log.foreach(_.record(currentVersion + 1, replace = true, t, r))
    statsHist = statsHist :+ Some(CommitStats.of(r, curSchema))
    cur = r.toVector
    entries = entries :+ VBase(cur)
    counts = counts :+ cur.length.toLong
    times = times :+ t
  }
  /** Commit one row-level delta (the `WriteDelta` landing): positions
    * index the current snapshot. Memory retains O(delta), the durable
    * commit file holds O(delta) bytes, and the stats sidecar
    * SELF-HEALS incrementally — only a column whose extremal value was
    * removed rescans, and only that column (the same trick q290's BM25
    * delete uses for df). */
  def applyRowDelta(deletes: Seq[Long], updates: Seq[(Long, InternalRow)],
      inserts: Seq[InternalRow]): Unit = synchronized {
    val prev = cur
    deletes.foreach(p => require(p >= 0 && p < prev.length,
      s"delta delete position $p outside snapshot of ${prev.length}"))
    updates.foreach { case (p, _) => require(p >= 0 && p < prev.length,
      s"delta update position $p outside snapshot of ${prev.length}") }
    val d = VRowDelta(deletes.toVector, updates.toVector, inserts.toVector)
    val next = VDelta.apply(prev, d)
    val t = MemStore.nowMicros()
    val st = statsHist.last match {
      case Some(ps) =>
        CommitStats.applyDelta(ps, curSchema, prev, d, next)
      case None => CommitStats.of(next, curSchema)
    }
    log.foreach(_.recordDelta(currentVersion + 1, t, d, st))
    statsHist = statsHist :+ Some(st)
    cur = next
    entries = entries :+ d
    counts = counts :+ cur.length.toLong
    times = times :+ t
  }
  /** ALTER TABLE ADD COLUMN: append-only schema evolution as its own
    * commit version (rows unchanged; existing versions read the new
    * column as NULL). Write-ahead like data commits. */
  def evolveSchema(newSchema: StructType): Unit = synchronized {
    require(newSchema.length > curSchema.length &&
      newSchema.take(curSchema.length) == StructType(curSchema.fields),
      "schema evolution must be append-only (ADD COLUMN)")
    val t = MemStore.nowMicros()
    log.foreach(_.recordSchema(currentVersion + 1, t, newSchema))
    curSchema = newSchema
    statsHist = statsHist :+ statsHist.last
    entries = entries :+ VMarker
    counts = counts :+ counts.last
    times = times :+ t
  }
  /** (version, commit micros, row count) per retained version. */
  def historyRows: Seq[(Long, Long, Long)] = synchronized {
    entries.indices.map(i => ((base + i).toLong, times(i), counts(i)))
  }

  /** CHANGE DATA FEED over the retained delta history (the Delta
    * `table_changes(from, to)` surface): one (change_type, version,
    * row) triple per changed row — appends emit `insert`, row-level
    * deltas emit `delete` (the pre-image resolved from the previous
    * snapshot at the recorded position) and `update_preimage` /
    * `update_postimage` pairs, replaces (INSERT OVERWRITE / RESTORE)
    * emit a full delete+insert sweep (the Delta overwrite convention),
    * schema markers emit nothing. This falls straight out of storing
    * history AS deltas — no diffing of snapshots, cost O(changes in
    * range) plus one fold to the range's starting snapshot. */
  def changes(fromV: Int, toV: Int): Seq[(String, Long, InternalRow)] =
    synchronized {
      // fromV == base is allowed: the oldest retained version streams
      // as pure inserts of its consolidated snapshot (folded from the
      // empty table) — the initial-load convention a streaming reader
      // starting before retention uses. Anything earlier is pruned.
      require(fromV >= base,
        s"changes from version $fromV — history is pruned before " +
          s"version $base")
      require(fromV <= toV && toV <= currentVersion,
        s"change range [$fromV, $toV] outside retained " +
          s"window [$base, $currentVersion]")
      var prev = entries.slice(0, fromV - base)
        .foldLeft(Vector.empty[InternalRow])(VDelta.apply)
      val out = Vector.newBuilder[(String, Long, InternalRow)]
      var v = fromV
      while (v <= toV) {
        val d = entries(v - base)
        d match {
          case VAppend(rows) =>
            rows.foreach(r => out += (("insert", v.toLong, r)))
          case VBase(rows) =>
            prev.foreach(r => out += (("delete", v.toLong, r)))
            rows.foreach(r => out += (("insert", v.toLong, r)))
          case VRowDelta(dels, upds, ins) =>
            dels.foreach(pn =>
              out += (("delete", v.toLong, prev(pn.toInt))))
            upds.foreach { case (pn, r) =>
              out += (("update_preimage", v.toLong, prev(pn.toInt)))
              out += (("update_postimage", v.toLong, r))
            }
            ins.foreach(r => out += (("insert", v.toLong, r)))
          case VMarker => ()
        }
        prev = VDelta.apply(prev, d)
        v += 1
      }
      out.result()
    }

  /** Expire every snapshot before `before` (retention): the log
    * consolidates `before` into a self-contained replace commit and
    * deletes the prefix; in memory the window re-bases onto a folded
    * [[VBase]]. Reads of expired versions fail loudly thereafter. */
  def expireBefore(before: Int): Unit = synchronized {
    require(before > base && before <= currentVersion,
      s"expireBefore($before): retained window is [$base, $currentVersion]")
    val i = before - base
    val snap = versionSnapshot(before).toVector
    log.foreach(_.expireBefore(before, times(i), snap))
    // consolidation re-records exact stats from the rows, so the
    // oldest retained version is always stats-served even if an
    // earlier sidecar had been lost
    entries = VBase(snap) +: entries.drop(i + 1)
    times = times.drop(i)
    counts = counts.drop(i)
    statsHist = statsHist.drop(i).updated(0,
      Some(CommitStats.of(snap, curSchema)))
    base = before
  }
  /** Replay-time install (no re-logging). The first retained commit
    * after an expiry is a self-contained replace with version > 1. */
  private def fold(entry: LogEntry): Unit = {
    val pruned = base == 0 && entries.length == 1 && entry.version > 1
    val (delta, st): (VDelta, Option[CommitStats]) = entry match {
      case DataCommit(ver, replace, _, rows, s) =>
        if (pruned) {
          // pruned-prefix log: the FIRST folded commit IS the oldest
          // retained version (later commits fold normally even when a
          // replace leaves the window at length 1)
          require(replace,
            s"corrupt log: first retained commit $ver is not self-contained")
          base = ver
          entries = Vector.empty
          times = Vector.empty
          counts = Vector.empty
          statsHist = Vector.empty
          (VBase(rows), s)
        } else {
          require(ver == currentVersion + 1,
            s"corrupt log: commit $ver after version $currentVersion")
          if (replace) (VBase(rows), s)
          else (VAppend(rows),
            for { a <- statsHist.last; b <- s } yield CommitStats.merge(a, b))
        }
      case DeltaCommit(ver, _, deletes, updates, inserts, s) =>
        require(!pruned,
          s"corrupt log: pruned prefix opens with delta commit $ver")
        require(ver == currentVersion + 1,
          s"corrupt log: commit $ver after version $currentVersion")
        // the delta sidecar carries the RESULT snapshot's stats (a
        // delete can't be folded forward), so it re-seeds like replace
        (VRowDelta(deletes, updates, inserts), s)
      case SchemaCommit(ver, _, _) =>
        // schema content already rides in _schema.json (the latest);
        // the marker just reserves its version number. Expiry always
        // consolidates the oldest retained version into a DATA replace
        // (overwriting a marker at that number), so a marker can never
        // legitimately open a pruned-prefix log.
        require(!pruned,
          s"corrupt log: pruned prefix opens with schema marker $ver")
        require(ver == currentVersion + 1,
          s"corrupt log: commit $ver after version $currentVersion")
        (VMarker, statsHist.last)
    }
    cur = VDelta.apply(cur, delta)
    entries = entries :+ delta
    counts = counts :+ cur.length.toLong
    times = times :+ entry.tsMicros
    statsHist = statsHist :+ st
  }
}

private[sources] object MemStore {
  def nowMicros(): Long = System.currentTimeMillis() * 1000L

  /** Rebuild the retained version history from a durable log — the
    * restart path. The rebuilt store keeps logging to the same log. */
  def replayFrom(log: CommitLog): MemStore = {
    val store = new MemStore(log.schema, Some(log), log.createdMicros)
    log.replay().foreach(store.fold)
    store
  }
}

/** A table handle; `pinned` carries a historical snapshot for time
  * travel reads (writes always address the LIVE store — Spark never
  * routes DML through a time-travel relation). Exposes the `__pos`
  * row-position METADATA column ([[MemTable.PosCol]]) — the row id the
  * delta protocol addresses deletes/updates by, the single-store
  * analog of Iceberg's `(_file, _pos)`. */
private[sources] final class MemTable(tableName: String, store: MemStore,
    pinned: Option[(Int, Array[InternalRow])] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def name(): String = tableName
  override def schema(): StructType = store.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = MemTable.PosCol
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "row position in the scanned snapshot (delta row id)"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // a LIVE table can also be read as a stream (version offsets);
    // time-travel handles are batch-only by construction
    new MemScanBuilder(store, pinned,
      streamStore = if (pinned.isEmpty) Some(store) else None)

  /** Plain writes append; `INSERT OVERWRITE` routes through the
    * `SupportsTruncate` hook (the unpartitioned-table overwrite
    * contract) and commits the new row set as ONE replace version —
    * atomic, and a single entry in the snapshot history. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replaceAll = false
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      override def build(): Write = new MemWrite(store, replaceAll)
    }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MemDeltaOperation(store, info.command)
}

private[sources] object MemTable {
  /** Metadata column name: the row's position in the scanned
    * snapshot. Double-underscored to stay clear of user columns. */
  val PosCol = "__pos"
}

/** Filter-pushdown support for the catalog scan: the translatable
  * subset (comparisons/IS NULL/IN on atomic orderable columns with
  * exact-type literals) evaluates INSIDE the scan, and a predicate the
  * snapshot statistics CONTRADICT (e.g. `k > max(k)`) short-circuits
  * to an empty scan without touching a single row — the catalog-grain
  * zone-map skip. Anything else is declined and Spark filters above
  * the scan; handled filters are exact, so Spark drops its own
  * FilterExec for them. */
private[sources] object MemFilters {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  /** TEST HOOK: rows actually evaluated by pushed filters — lets a
    * spec prove the stats short-circuit never scanned. */
  private[sources] val evaluated = new java.util.concurrent.atomic.AtomicLong

  /** Exact-type literal -> Catalyst internal value; None = decline.
    * Strict on numeric classes: a cross-type literal means Catalyst
    * cast the column, and such predicates are never translated — a
    * lenient narrowing here would silently change semantics. */
  private def internal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (LongType, x: java.lang.Long) => Some(x)
    case (IntegerType, x: java.lang.Integer) => Some(x)
    case (ShortType, x: java.lang.Short) => Some(x)
    case (ByteType, x: java.lang.Byte) => Some(x)
    case (BooleanType, x: java.lang.Boolean) => Some(x)
    case (StringType, x: String) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x))
    case _ => None
  }

  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)

  private def fieldIdx(schema: StructType, name: String): Option[Int] =
    schema.fields.indexWhere(_.name == name) match {
      case -1 => None
      case i => Some(i)
    }

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v) => lit(schema, a, v).isDefined
    case GreaterThan(a, v) => lit(schema, a, v).isDefined
    case GreaterThanOrEqual(a, v) => lit(schema, a, v).isDefined
    case LessThan(a, v) => lit(schema, a, v).isDefined
    case LessThanOrEqual(a, v) => lit(schema, a, v).isDefined
    case In(a, vs) => vs.nonEmpty && vs.forall(v => lit(schema, a, v).isDefined)
    case IsNull(a) => fieldIdx(schema, a).isDefined
    case IsNotNull(a) => fieldIdx(schema, a).isDefined
    case _ => false
  }

  private def lit(schema: StructType, name: String, v: Any): Option[(Int, Any)] =
    fieldIdx(schema, name).flatMap(i =>
      internal(schema(i).dataType, v).map(iv => (i, iv)))

  /** SQL semantics: a comparison with a NULL row value is not TRUE —
    * the row drops. Prefix-arity rows read appended columns as NULL. */
  def eval(schema: StructType, filters: Seq[Filter], r: InternalRow): Boolean = {
    evaluated.incrementAndGet()
    def value(i: Int): Any =
      if (i >= r.numFields || r.isNullAt(i)) null
      else r.get(i, schema(i).dataType)
    filters.forall {
      case EqualTo(a, v) => test(schema, a, v, value, _ == 0)
      case GreaterThan(a, v) => test(schema, a, v, value, _ > 0)
      case GreaterThanOrEqual(a, v) => test(schema, a, v, value, _ >= 0)
      case LessThan(a, v) => test(schema, a, v, value, _ < 0)
      case LessThanOrEqual(a, v) => test(schema, a, v, value, _ <= 0)
      case In(a, vs) => vs.exists(v => test(schema, a, v, value, _ == 0))
      case IsNull(a) => fieldIdx(schema, a).exists(i => value(i) == null)
      case IsNotNull(a) => fieldIdx(schema, a).exists(i => value(i) != null)
      case _ => false // unreachable: only supported() filters are pushed
    }
  }

  private def test(schema: StructType, a: String, v: Any, value: Int => Any,
      ok: Int => Boolean): Boolean =
    lit(schema, a, v) match {
      case Some((i, iv)) =>
        val x = value(i)
        x != null && ok(cmp(x, iv))
      case None => false
    }

  /** True only when the snapshot statistics PROVE the conjunction is
    * empty (min/max tracked, every matching value outside the range,
    * or the null/non-null population is zero) — then the scan serves
    * empty without materializing rows. Conservative: unknown = false. */
  def contradictsStats(stats: Option[CommitStats], schema: StructType,
      filters: Seq[Filter]): Boolean = stats.exists { st =>
    filters.exists {
      case EqualTo(a, v) => outside(st, schema, a, v, eqOnly = true)
      case GreaterThan(a, v) => boundDead(st, schema, a, v)(
        (mx, iv) => cmp(mx, iv) <= 0)
      case GreaterThanOrEqual(a, v) => boundDead(st, schema, a, v)(
        (mx, iv) => cmp(mx, iv) < 0)
      case LessThan(a, v) => boundDeadMin(st, schema, a, v)(
        (mn, iv) => cmp(mn, iv) >= 0)
      case LessThanOrEqual(a, v) => boundDeadMin(st, schema, a, v)(
        (mn, iv) => cmp(mn, iv) > 0)
      case In(a, vs) => vs.forall(v => outside(st, schema, a, v, eqOnly = true))
      case IsNull(a) =>
        st.cols.get(a).exists(_.nulls == 0) && st.count > 0
      case IsNotNull(a) =>
        st.cols.get(a).exists(c => c.nulls == st.count)
      case _ => false
    }
  }

  private def tracked(st: CommitStats, schema: StructType, a: String,
      v: Any): Option[(ColStats, Any)] =
    for {
      i <- fieldIdx(schema, a)
      iv <- internal(schema(i).dataType, v)
      c <- st.cols.get(a) if c.tracked
    } yield (c, iv)

  private def outside(st: CommitStats, schema: StructType, a: String,
      v: Any, eqOnly: Boolean): Boolean =
    tracked(st, schema, a, v).exists { case (c, iv) =>
      (c.min, c.max) match {
        case (Some(mn), Some(mx)) => cmp(iv, mn) < 0 || cmp(iv, mx) > 0
        case _ => st.count > 0 && c.nulls == st.count // all-NULL column
      }
    }

  private def boundDead(st: CommitStats, schema: StructType, a: String,
      v: Any)(dead: (Any, Any) => Boolean): Boolean =
    tracked(st, schema, a, v).exists { case (c, iv) =>
      c.max.exists(mx => dead(mx, iv)) ||
        (c.max.isEmpty && st.count > 0 && c.nulls == st.count)
    }

  private def boundDeadMin(st: CommitStats, schema: StructType, a: String,
      v: Any)(dead: (Any, Any) => Boolean): Boolean =
    tracked(st, schema, a, v).exists { case (c, iv) =>
      c.min.exists(mn => dead(mn, iv)) ||
        (c.min.isEmpty && st.count > 0 && c.nulls == st.count)
    }
}

/** Scan builder with COLUMN PRUNING (incl. the `__pos` metadata
  * column) and AGGREGATE PUSHDOWN served from the commit-log stats
  * sidecars (the Delta/Iceberg metadata-only `SELECT count(*)` path):
  * a no-grouping aggregation of COUNT(*) / COUNT(col) / MIN(col) /
  * MAX(col) over columns with tracked stats is answered COMPLETELY
  * from the snapshot's folded statistics — the scan emits ONE row and
  * no data is read, which at 100 TB is the difference between a
  * metadata lookup and a full-corpus pass. Anything else (grouping,
  * DISTINCT, sums, floating-point min/max, a version whose stats
  * sidecar is lost) declines, and Spark aggregates the plain scan —
  * pushdown steers the plan, never the results. */
private[sources] final class MemScanBuilder(store: MemStore,
    pinned: Option[(Int, Array[InternalRow])],
    streamStore: Option[MemStore] = None) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var served: Option[(StructType, InternalRow)] = None
  private var required: Option[StructType] = None
  private var pushedArr: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  /** Push the translatable subset; the rest stays with Spark. Handled
    * filters are evaluated EXACTLY in the scan, so Spark drops its own
    * FilterExec for them (partial pushdown keeps a residual filter). */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (ok, rest) = filters.partition(MemFilters.supported(store.schema, _))
    pushedArr = ok
    rest
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushedArr

  private def targetStats: Option[CommitStats] =
    pinned.map(p => store.statsAt(p._1))
      .getOrElse(store.statsAt(store.currentVersion))

  private def colName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      Some(r.fieldNames.head)
    case _ => None
  }

  private def plan(agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    // snapshot stats describe the UNFILTERED table: with any pushed
    // filter the metadata answer would be wrong — decline, Spark
    // aggregates the (source-filtered) scan
    if (pushedArr.nonEmpty) return None
    val schema = store.schema
    targetStats.flatMap { st =>
      val fields = Vector.newBuilder[org.apache.spark.sql.types.StructField]
      val values = Vector.newBuilder[Any]
      val ok = agg.aggregateExpressions.forall {
        case _: CountStar =>
          fields += org.apache.spark.sql.types.StructField(
            "count_star", org.apache.spark.sql.types.LongType, nullable = false)
          values += st.count
          true
        case c: Count if !c.isDistinct =>
          colName(c.column).flatMap(st.cols.get) match {
            case Some(cs) =>
              fields += org.apache.spark.sql.types.StructField(
                "count_col", org.apache.spark.sql.types.LongType,
                nullable = false)
              values += (st.count - cs.nulls)
              true
            case None => false
          }
        case m: Min =>
          colName(m.column).flatMap { n =>
            st.cols.get(n).filter(_.tracked).map((n, _))
          } match {
            case Some((n, cs)) =>
              fields += org.apache.spark.sql.types.StructField(
                "min_col", schema(schema.fieldIndex(n)).dataType)
              values += cs.min.orNull
              true
            case None => false
          }
        case m: Max =>
          colName(m.column).flatMap { n =>
            st.cols.get(n).filter(_.tracked).map((n, _))
          } match {
            case Some((n, cs)) =>
              fields += org.apache.spark.sql.types.StructField(
                "max_col", schema(schema.fieldIndex(n)).dataType)
              values += cs.max.orNull
              true
            case None => false
          }
        case _ => false
      }
      if (!ok) None
      else Some((StructType(fields.result()),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          values.result().toArray)))
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    plan(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    served = plan(agg)
    served.isDefined
  }

  override def build(): org.apache.spark.sql.connector.read.Scan =
    served match {
      case Some((schema, row)) =>
        // the metadata-served aggregate row already IS the output row
        new MemScan(schema, schema, () => Array(row), () => 1L,
          direct = true)
      case None =>
        // with pushed filters the count is an upper bound (the
        // unfiltered snapshot) — still finite and sane for planning
        val rowCount =
          () => targetStats.map(_.count)
            .getOrElse(pinned.map(_._2.length.toLong)
              .getOrElse(store.snapshot().length.toLong))
        val schema = store.schema
        val pushed = pushedArr.toSeq
        val st = () => targetStats
        val snap = () => {
          val base = pinned.map(_._2).getOrElse(store.snapshot())
          if (pushed.nonEmpty &&
              MemFilters.contradictsStats(st(), schema, pushed))
            Array.empty[InternalRow] // zone-map skip: zero rows touched
          else base
        }
        // filters evaluate in the READER so `__pos` stays the row's
        // index in the UNFILTERED snapshot — a filtered row-level scan
        // must hand the delta writer true snapshot positions
        val keep: InternalRow => Boolean =
          if (pushed.isEmpty) null
          else r => MemFilters.eval(schema, pushed, r)
        new MemScan(required.getOrElse(schema), schema, snap, rowCount,
          keep = keep, streamStore = streamStore)
    }
}

/** Full-table scan: one partition carrying the snapshot (the store is
  * JVM-local; a format would plan file splits here). The snapshot
  * thunk is resolved at PLANNING time — live tables read the store's
  * current version, time-travel tables a pinned historical one. The
  * output schema may be any pruned subset of the data columns plus
  * the `__pos` metadata column (the row's index in the snapshot —
  * positions are per-snapshot-ordering, which the single writer keeps
  * stable between a row-level scan and its delta commit). */
private[sources] final class MemScan(outSchema: StructType,
    dataSchema: StructType, snap: () => Array[InternalRow],
    rowCount: () => Long = () => 0L, direct: Boolean = false,
    keep: InternalRow => Boolean = null,
    streamStore: Option[MemStore] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  /** STREAMING read of the live table (`spark.readStream.table`):
    * offsets are COMMIT VERSIONS off the delta log — each micro-batch
    * serves the rows INSERTED in (start, end] (appends, merge inserts,
    * and the consolidated initial load; updates/deletes are skipped —
    * the Delta `ignoreChanges` posture), so a downstream job follows a
    * continuously-ingesting table exactly-once with checkpointed
    * version offsets and never rescans history. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    streamStore.map(st =>
      new MemMicroBatchStream(st, () => createReaderFactory())).getOrElse(
      throw new UnsupportedOperationException(
        "streaming reads address the LIVE table, not a time-travel handle"))

  /** CBO statistics served from the snapshot stats (the commit-log
    * sidecar fold): exact row count, size estimated at the pruned
    * read schema's default width. This is what lets Spark choose a
    * BROADCAST join for a small catalog dim against a 100 TB fact
    * without a hint — a v2 scan with no reported statistics defaults
    * to "infinitely large" and every catalog join degrades to
    * sort-merge (CboStatsSpec pins both directions). */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val n = rowCount()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(
          math.max(1L, n * outSchema.defaultSize))
    }
  /** Split the snapshot into ranged partitions (a format would plan
    * file splits here): contiguous slices carrying their GLOBAL base
    * position, so `__pos` and the delta protocol stay correct under a
    * parallel scan. Tiny snapshots stay single-partition. */
  override def planInputPartitions(): Array[InputPartition] = {
    val rows = snap()
    val chunk = MemScan.TargetChunk
    if (rows.length <= chunk) Array(MemPartition(rows, 0L))
    else {
      val n = math.min(MemScan.MaxPartitions,
        (rows.length + chunk - 1) / chunk)
      val per = (rows.length + n - 1) / n
      Array.tabulate(n) { k =>
        MemPartition(rows.slice(k * per,
          math.min(rows.length, (k + 1) * per)), (k * per).toLong)
      }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val out = outSchema
    val data = dataSchema
    val serveAsIs = direct
    val keepFn = keep
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = p.asInstanceOf[MemPartition].rows
          private val base = p.asInstanceOf[MemPartition].basePos
          // identity fast path: full-width rows served as-is
          private val identity = serveAsIs ||
            (out == data && rows.forall(_.numFields == data.length))
          // per-output-field source: data-column index, or -1 = __pos
          private val srcIdx =
            if (identity) Array.empty[Int]
            else out.fields.map { f =>
              if (f.name == MemTable.PosCol) -1 else data.fieldIndex(f.name)
            }
          private var i = -1
          override def next(): Boolean = {
            i += 1
            if (keepFn != null)
              while (i < rows.length && !keepFn(rows(i))) i += 1
            i < rows.length
          }
          // rows written before an ADD COLUMN carry a prefix arity:
          // appended columns read as NULL (the Delta AddColumn read
          // behavior — no rewrite of history)
          override def get(): InternalRow = {
            val r = rows(i)
            if (identity) r
            else {
              val vals = new Array[Any](srcIdx.length)
              var j = 0
              while (j < srcIdx.length) {
                val s = srcIdx(j)
                vals(j) =
                  if (s < 0) base + i
                  else if (s < r.numFields) r.get(s, data(s).dataType)
                  else null
                j += 1
              }
              new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(vals)
            }
          }
          override def close(): Unit = ()
        }
    }
  }
}

private[sources] object MemScan {
  /** Rows per planned split (and the single-partition threshold). */
  val TargetChunk: Int =
    sys.props.getOrElse("graft.catalog.scan.chunk", "8192").toInt
  val MaxPartitions = 32
}

/** One contiguous snapshot slice; `basePos` is the slice's first row's
  * index in the FULL snapshot (keeps `__pos` global). */
private[sources] final case class MemPartition(rows: Array[InternalRow],
    basePos: Long) extends InputPartition

/** Version offset for the catalog's streaming read. */
private[sources] final case class MemOffset(version: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** Micro-batch stream over the delta log: initial offset sits just
  * below the oldest retained version, so the first batch delivers the
  * full existing table (consolidated snapshot = pure inserts) and
  * every later batch exactly the rows inserted by the commits in its
  * offset range — O(changes), never a table rescan. */
private[sources] final class MemMicroBatchStream(store: MemStore,
    readerFactory: () => PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = MemOffset(store.oldestVersion - 1)
  override def latestOffset(): Offset = MemOffset(store.currentVersion)
  override def deserializeOffset(json: String): Offset =
    MemOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MemOffset].version
    val e = end.asInstanceOf[MemOffset].version
    if (e <= s) Array.empty
    else {
      // a FRESH stream's initial offset is oldestVersion - 1 (first
      // batch = the consolidated base). A CHECKPOINTED offset below
      // that means retention expired commits the checkpoint never
      // consumed-past — resuming would silently re-deliver the whole
      // consolidated snapshot as duplicates. Fail loudly instead (the
      // Delta startingVersion-below-retention convention).
      require(s >= store.oldestVersion - 1,
        s"checkpointed offset $s predates the retained window " +
          s"[${store.oldestVersion}, ${store.currentVersion}] — " +
          "resuming would re-deliver the consolidated base; reset the " +
          "checkpoint or retain more history")
      val rows = store.changes(s + 1, e)
        .collect { case ("insert", _, r) => r }
      Array(MemPartition(rows.toArray, 0L))
    }
  }

  // reuse the batch scan's reader verbatim: pruned schemas, pushed
  // filters, and prefix-arity padding behave identically under the
  // stream (a batch-position __pos is batch-local by construction)
  override def createReaderFactory(): PartitionReaderFactory =
    readerFactory()
}

/** DELTA-BASED row-level operation (the `SupportsDelta` side of the
  * DSv2 contract — Iceberg's position-delta class): the scan exposes
  * `__pos` as the row id, Spark's `WriteDelta` plan routes each
  * affected row to the writer's delete/update/insert verb, and the
  * commit applies O(delta) to the store — never a whole-table
  * rewrite. Compare the r11 group-based implementation, which
  * committed the complete surviving row set per MERGE. */
private[sources] final class MemDeltaOperation(store: MemStore,
    cmd: RowLevelOperation.Command) extends RowLevelOperation
    with SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(store, None)
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new MemDeltaWrite(store)
    }
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(MemTable.PosCol))
}

/** The delta write: each task writer accumulates (position-addressed)
  * deletes/updates plus inserts; the driver-side commit applies them
  * as ONE atomic version. Rows arrive in reused buffers — copy on
  * receipt, exactly like the append writer. */
private[sources] final class MemDeltaWrite(store: MemStore)
    extends DeltaWrite with DeltaBatchWrite {
  override def toBatch: DeltaBatchWrite = this
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val width = store.schema.length
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int,
          taskId: Long): DeltaWriter[InternalRow] =
        new DeltaWriter[InternalRow] {
          private val deletes = Vector.newBuilder[Long]
          private val updates = Vector.newBuilder[(Long, InternalRow)]
          private val inserts = Vector.newBuilder[InternalRow]
          private def checkArity(row: InternalRow): InternalRow = {
            require(row.numFields == width,
              s"delta row arity ${row.numFields} for $width-column table")
            row.copy()
          }
          override def delete(meta: InternalRow, id: InternalRow): Unit =
            deletes += id.getLong(0)
          override def update(meta: InternalRow, id: InternalRow,
              row: InternalRow): Unit =
            updates += ((id.getLong(0), checkArity(row)))
          override def insert(row: InternalRow): Unit =
            inserts += checkArity(row)
          override def commit(): WriterCommitMessage =
            MemDeltaCommit(deletes.result(), updates.result(),
              inserts.result())
          override def abort(): Unit = ()
          override def close(): Unit = ()
        }
    }
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ds = Vector.newBuilder[Long]
    val us = Vector.newBuilder[(Long, InternalRow)]
    val is = Vector.newBuilder[InternalRow]
    messages.foreach {
      case MemDeltaCommit(d, u, i) => ds ++= d; us ++= u; is ++= i
      case _ =>
    }
    store.applyRowDelta(ds.result(), us.result(), is.result())
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] final case class MemDeltaCommit(deletes: Vector[Long],
    updates: Vector[(Long, InternalRow)], inserts: Vector[InternalRow])
  extends WriterCommitMessage

/** The append/overwrite write side (INSERT / INSERT OVERWRITE / CTAS;
  * row-level DML goes through [[MemDeltaWrite]]). */
private[sources] final class MemWrite(store: MemStore, replaceAll: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val width = store.schema.length
    new DataWriterFactory {
      override def createWriter(partitionId: Int,
          taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val buf = Vector.newBuilder[InternalRow]
          override def write(record: InternalRow): Unit = {
            require(record.numFields == width,
              s"unexpected write row arity ${record.numFields} for $width-column table")
            buf += record.copy()
          }
          override def commit(): WriterCommitMessage = MemCommit(buf.result())
          override def abort(): Unit = ()
          override def close(): Unit = ()
        }
    }
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.toSeq.flatMap {
      case MemCommit(r) => r
      case _ => Seq.empty
    }
    if (replaceAll) store.replace(rows) else store.append(rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] final case class MemCommit(rows: Vector[InternalRow])
  extends WriterCommitMessage
