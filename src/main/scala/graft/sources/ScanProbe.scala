package graft.sources

/** Standalone scan probe for the file-backed data plane: replays a
  * table's commit log and STREAMS every live row, counting — no
  * SparkSession, no heap materialization. Run in a forked JVM with a
  * tiny `-Xmx` against a table far larger than the heap, it proves
  * the property the plane exists for: scan memory is O(1) in table
  * size (one streaming row + O(files) metadata), so the same
  * connector serves a table of any size.
  *
  * Usage: `graft.sources.ScanProbe <tableLogDir> <expectedRows>`
  * Exits 0 iff the streamed live count matches.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScanProbe <tableLogDir> <expectedRows>")
    val dir = java.nio.file.Paths.get(args(0))
    val expected = args(1).toLong
    val store = MemStore.replayFrom(CommitLog.open(dir))
    val (snap, _) = store.currentState()
    var n = 0L
    val it = snap.iterator(store.schema)
    while (it.hasNext) { it.next(); n += 1 }
    println(s"ScanProbe: streamed $n live rows (expected $expected), " +
      s"maxHeap=${Runtime.getRuntime.maxMemory() / (1024 * 1024)}MB")
    if (n != expected) sys.exit(1)
  }
}
