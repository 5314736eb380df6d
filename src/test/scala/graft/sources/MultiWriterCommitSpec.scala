package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimistic multi-writer commits on one durable table — the
  * Delta/Iceberg concurrency protocol in miniature. A second
  * [[MemStore]] replayed straight off the commit log simulates a
  * second Spark driver (its own in-memory state, the same directory):
  *
  *  1. two appends race for one version — create-new publication makes
  *     exactly one win; the loser refreshes and lands at the next
  *     version (BOTH commits survive, none is lost);
  *  2. a row-level delta rebases over an interleaved append (appends
  *     only extend the live ordering, positions stay valid);
  *  3. delta-vs-delta and replace-vs-append conflict and ABORT with
  *     ConcurrentModificationException — never silent corruption;
  *  4. after the races, a cold replay yields contiguous versions and
  *     the exact surviving row set.
  */
class MultiWriterCommitSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_mw").toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def row(k: Long, v: String): InternalRow =
    new GenericInternalRow(Array[Any](k, UTF8String.fromString(v)))

  /** Stream rows into a fresh data file (what a write task does) and
    * hand back its commit reference. */
  private def writeFile(dir: java.nio.file.Path,
      rows: Seq[InternalRow]): FileRef = {
    val name = s"mw-${java.util.UUID.randomUUID().toString.take(12)}.parquet"
    val w = ParquetRowIO.writer(dir.resolve("data").resolve(name).toString,
      schema)
    val acc = new CommitStats.Acc(schema)
    rows.foreach { r => w.write(r); acc.add(r) }
    val n = w.close()
    FileRef(name, n, Some(acc.result))
  }

  private def statsOf(rows: Seq[InternalRow]): CommitStats =
    CommitStats.of(rows, schema)

  private def freshTable(name: String): (java.nio.file.Path, MemStore) = {
    val dir = java.nio.file.Paths.get(root, name)
    val log = CommitLog.create(dir, schema, MemStore.nowMicros())
    (dir, new MemStore(schema, Some(log)))
  }

  private def secondWriter(dir: java.nio.file.Path): MemStore =
    MemStore.replayFrom(CommitLog.open(dir))

  private def keys(dir: java.nio.file.Path): Seq[Long] = {
    val st = MemStore.replayFrom(CommitLog.open(dir))
    val (snap, _) = st.currentState()
    snap.iterator(st.schema).map(_.getLong(0)).toVector
  }

  test("two racing appends both land; the loser refreshes and retries") {
    val (dir, w1) = freshTable("t_app")
    val r1 = Seq(row(1L, "a"), row(2L, "b"))
    w1.commitFiles(Seq(writeFile(dir, r1)), statsOf(r1), FileCommit.Append) // v1
    val w2 = secondWriter(dir) // at v1
    // w1 lands v2; w2 is now STALE
    val r2 = Seq(row(3L, "c"))
    w1.commitFiles(Seq(writeFile(dir, r2)), statsOf(r2), FileCommit.Append)
    // w2's attempt at v2 must collide, refresh, and land at v3
    val r3 = Seq(row(4L, "d"))
    w2.commitFiles(Seq(writeFile(dir, r3)), statsOf(r3), FileCommit.Append)
    assert(w2.currentVersion == 3, s"loser landed at ${w2.currentVersion}")
    assert(keys(dir).sorted == Seq(1L, 2L, 3L, 4L), keys(dir).toString)
    // contiguous history on cold replay
    val versions = CommitLog.open(dir).replay().map(_.version)
    assert(versions == Seq(1, 2, 3), versions.toString)
  }

  test("a row-level delta rebases over an interleaved append") {
    val (dir, w1) = freshTable("t_delta")
    val r1 = Seq(row(10L, "x"), row(11L, "y"))
    w1.commitFiles(Seq(writeFile(dir, r1)), statsOf(r1), FileCommit.Append)
    val w2 = secondWriter(dir)
    // interleave an append from w1
    val r2 = Seq(row(12L, "z"))
    w1.commitFiles(Seq(writeFile(dir, r2)), statsOf(r2), FileCommit.Append)
    // w2 deletes position 0 (row k=10) computed against the OLD
    // snapshot — positions survive an append rebase
    w2.applyRowDelta(Seq(0L), Nil, Seq(row(13L, "w")))
    assert(keys(dir).sorted == Seq(11L, 12L, 13L), keys(dir).toString)
  }

  test("delta vs delta, and replace vs append, abort loudly") {
    val (dir, w1) = freshTable("t_conflict")
    val r1 = Seq(row(20L, "p"), row(21L, "q"), row(22L, "r"))
    w1.commitFiles(Seq(writeFile(dir, r1)), statsOf(r1), FileCommit.Append)
    val w2 = secondWriter(dir)
    w1.applyRowDelta(Seq(1L), Nil, Nil) // w1 deletes k=21
    val e1 = intercept[java.util.ConcurrentModificationException] {
      w2.applyRowDelta(Seq(2L), Nil, Nil) // stale positions
    }
    assert(e1.getMessage.contains("positions"), e1.getMessage)
    // w2 refreshed during the failed attempt; a recomputed delta lands
    w2.applyRowDelta(Seq(1L), Nil, Nil) // deletes k=22 in the NEW order
    assert(keys(dir).sorted == Seq(20L), keys(dir).toString)

    // replace loses to a concurrent append
    val w3 = secondWriter(dir)
    val r2 = Seq(row(23L, "s"))
    w1.commitFiles(Seq(writeFile(dir, r2)), statsOf(r2), FileCommit.Append)
    val rep = Seq(row(99L, "only"))
    intercept[java.util.ConcurrentModificationException] {
      w3.commitFiles(Seq(writeFile(dir, rep)), statsOf(rep),
        FileCommit.Replace)
    }
    // nothing was lost: both the delete survivor and the append live
    assert(keys(dir).sorted == Seq(20L, 23L), keys(dir).toString)
  }

  test("expiry consolidation over mid-file deletions keeps exact rows (volatile-row regression)") {
    // pins the Snap.overlaid fix: the overlay iterator must not read
    // ahead of the row it hands out — file rows are volatile, and a
    // prefetching next() used to overwrite the yielded row with its
    // successor whenever a deletion sat MID-file (head deletions
    // masked it). Consolidation streams exactly this iterator.
    val (dir, w) = freshTable("t_vol")
    val r1 = (0L until 10L).map(k => row(k, s"v$k"))
    w.commitFiles(Seq(writeFile(dir, r1)), statsOf(r1), FileCommit.Append)
    w.applyRowDelta(Seq(3L, 7L), Nil, Nil) // mid-file deletions
    assert(keys(dir) == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
    val r2 = Seq(row(100L, "tail"))
    w.commitFiles(Seq(writeFile(dir, r2)), statsOf(r2), FileCommit.Append)
    w.expireBefore(2) // consolidates v2's live view into a new base
    assert(keys(dir) == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L, 100L),
      "consolidation corrupted the surviving rows")
  }

  test("post-race history replays cleanly and serves time travel") {
    val (dir, w1) = freshTable("t_replay")
    val r1 = Seq(row(30L, "m"))
    w1.commitFiles(Seq(writeFile(dir, r1)), statsOf(r1), FileCommit.Append)
    val w2 = secondWriter(dir)
    val r2 = Seq(row(31L, "n"))
    w1.commitFiles(Seq(writeFile(dir, r2)), statsOf(r2), FileCommit.Append)
    val r3 = Seq(row(32L, "o"))
    w2.commitFiles(Seq(writeFile(dir, r3)), statsOf(r3), FileCommit.Append)
    val cold = MemStore.replayFrom(CommitLog.open(dir))
    assert(cold.currentVersion == 3)
    (1 to 3).foreach { v =>
      val snap = cold.versionSnapshot(v)
      assert(snap.count == v.toLong, s"version $v holds ${snap.count}")
    }
  }

  test("contention stress: 8 writers x 6 appends race one log, nothing lost") {
    val (dir, w0) = freshTable("t_stress")
    val seed = Seq(row(0L, "seed"))
    w0.commitFiles(Seq(writeFile(dir, seed)), statsOf(seed),
      FileCommit.Append)
    // 8 INDEPENDENT stores (simulated drivers), each appending 6
    // commits concurrently — every attempt races the others for its
    // version; the retry loop must land all 48 with zero loss
    val writers = (0 until 8).map(_ => secondWriter(dir))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    try {
      val tasks = writers.zipWithIndex.map { case (w, wi) =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try (0 until 6).foreach { k =>
              val rows = Seq(row(1000L * (wi + 1) + k, s"w$wi-$k"))
              w.commitFiles(Seq(writeFile(dir, rows)), statsOf(rows),
                FileCommit.Append)
            } catch { case t: Throwable => errs.add(t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(errs.isEmpty, s"writer errors: ${errs.toArray.mkString(", ")}")
    val cold = MemStore.replayFrom(CommitLog.open(dir))
    assert(cold.currentVersion == 49,
      s"expected 49 contiguous versions, got ${cold.currentVersion}")
    val ks = keys(dir)
    assert(ks.length == 49 && ks.toSet.size == 49,
      s"rows lost or duplicated: ${ks.length}")
    (0 until 8).foreach(wi => (0 until 6).foreach(k =>
      assert(ks.contains(1000L * (wi + 1) + k), s"missing w$wi-$k")))
  }
}
