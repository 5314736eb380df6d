package graft.sources

import graft.SparkTestBase

/** Commit-log CHECKPOINTING (the Delta `_checkpoint` analog): every
  * [[MemStore.CheckpointEvery]] commits the whole retained-window
  * metadata lands in one checkpoint file, and a cold load replays
  * checkpoint + commit SUFFIX — load cost bounded by
  * commits-since-checkpoint, not table lifetime. Pins:
  *
  *  1. the hard property: with every pre-checkpoint commit file
  *     DELETED from disk, the table still loads exactly — replay
  *     provably never read them;
  *  2. time travel and CDF inside the checkpointed window still work;
  *  3. expiry invalidates stale checkpoints (they capture pruned
  *     versions) and re-seeds a fresh one;
  *  4. a corrupt checkpoint falls back to full commit replay, never a
  *     failed open.
  */
class LogCheckpointSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_ckpt").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.graftck", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftck.path", root)
  }

  private def files(table: String, suffix: String): Seq[String] = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(root, table))
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.endsWith(suffix)) b += n
      }
      b.result().sorted
    } finally s.close()
  }

  test("cold load reads checkpoint + suffix: pre-checkpoint commits can vanish") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftck.t1")
    spark.sql("CREATE TABLE graftck.t1 (k BIGINT, v STRING)")
    // 18 commits: v1..v18 (checkpoint lands at v16), then a delta v19
    (1 to 18).foreach(i =>
      spark.sql(s"INSERT INTO graftck.t1 VALUES ($i, 'v$i')"))
    spark.sql("UPDATE graftck.t1 SET v = 'hit' WHERE k = 3") // v19
    assert(files("t1", ".checkpoint") == Seq("00000016.checkpoint"),
      files("t1", ".checkpoint").toString)

    // the HARD proof: delete every commit (and sidecar) at or below
    // the checkpoint — a loader that still replays them cannot load
    (1 to 16).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(root, "t1", f"$v%08d.commit"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(root, "t1", f"$v%08d.stats"))
    }
    MemCatalog.simulateRestart()
    val got = spark.table("graftck.t1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 18 && got(3L) == "hit" && got(17L) == "v17", got.toString)
    // time travel INSIDE the checkpointed window (entries ride the
    // checkpoint, not the deleted commit files)
    assert(spark.sql("SELECT k FROM graftck.t1 VERSION AS OF 5")
      .collect().map(_.getLong(0)).toSet == (1L to 5L).toSet)
    // CDF from v1 (the full retained window)
    val feed = MemCatalog.tableChanges(spark, "graftck", "t1", 1, 19)
    assert(feed.where("_change_type = 'insert'").count() == 18L)
    assert(feed.where("_change_type = 'update_postimage'").count() == 1L)
    // metadata-served aggregates still ride the checkpointed stats
    val plan = spark.sql("SELECT count(*) AS n FROM graftck.t1")
    assert(!plan.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(plan.head().getLong(0) == 18L)
  }

  test("expiry invalidates stale checkpoints and re-seeds a fresh one") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftck.t2")
    spark.sql("CREATE TABLE graftck.t2 (k BIGINT, v STRING)")
    (1 to 17).foreach(i =>
      spark.sql(s"INSERT INTO graftck.t2 VALUES ($i, 'v$i')"))
    assert(files("t2", ".checkpoint") == Seq("00000016.checkpoint"))
    MemCatalog.expireSnapshots("graftck", "t2", before = 17)
    // the pre-expiry checkpoint captured pruned versions: gone,
    // replaced by one at the post-expiry state
    assert(files("t2", ".checkpoint") == Seq("00000017.checkpoint"),
      files("t2", ".checkpoint").toString)
    MemCatalog.simulateRestart()
    assert(spark.table("graftck.t2").count() == 17L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graftck.t2 VERSION AS OF 5").collect())
    assert(e.getMessage.contains("expired"), e.getMessage)
  }

  test("a corrupt checkpoint degrades to full commit replay") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graftck.t3")
    spark.sql("CREATE TABLE graftck.t3 (k BIGINT, v STRING)")
    (1 to 17).foreach(i =>
      spark.sql(s"INSERT INTO graftck.t3 VALUES ($i, 'v$i')"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "t3", "00000016.checkpoint"),
      "garbage".getBytes)
    MemCatalog.simulateRestart()
    assert(spark.table("graftck.t3").count() == 17L,
      "corrupt checkpoint must fall back to commit replay")
    assert(spark.sql("SELECT k FROM graftck.t3 VERSION AS OF 2")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
