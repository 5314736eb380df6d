package graft.sources

import graft.SparkTestBase

/** Regression pins for the round-16 advisory findings:
  *
  *  1. [[TableTxn.recover]] must NOT treat a LIVE same-JVM
  *     transaction's manifest as crash residue: a cold loadTable
  *     landing between manifest publish and manifest delete used to
  *     roll back legs the coordinator was still publishing.
  *  2. A BRANCH store participating in a transaction is recorded in
  *     the manifest by its ROOT-RELATIVE directory
  *     (`.branches/<t>/<b>`), so rollback/recovery resolves the
  *     branch's real log — not a phantom `root/<branch>` table.
  *  3. FAST FORWARD publication is crash-safe: a pending marker
  *     written before the first suffix link lets load-time recovery
  *     delete the invisible orphan links (base+2..head) after a crash
  *     in the window, so a later unrelated write landing base+1 can
  *     never make the orphan suffix silently become table history.
  *  4. Checkpoint files carry a format-version header: a
  *     stale-layout checkpoint is rejected DETERMINISTICALLY and the
  *     cold load falls back to full commit replay.
  */
class Advice16RegressionSpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_adv16").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.ga16", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.ga16.path", root)
  }

  private def sha256(p: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(java.nio.file.Files.readAllBytes(p))
    md.digest().map(b => f"$b%02x").mkString
  }

  test("recover skips the manifest of a LIVE transaction; reaps it " +
      "once the txn is gone") {
    setup()
    spark.sql("DROP TABLE IF EXISTS ga16.live")
    spark.sql("DROP TABLE IF EXISTS ga16.live2")
    spark.sql("CREATE TABLE ga16.live (k BIGINT, s STRING)")
    spark.sql("CREATE TABLE ga16.live2 (k BIGINT, s STRING)")
    spark.sql("INSERT INTO ga16.live VALUES (1, 'a')")
    spark.sql("INSERT INTO ga16.live2 VALUES (1, 'a')")
    val st = MaintenanceSql.storeFor(spark, "ga16", "live")
    val st2 = MaintenanceSql.storeFor(spark, "ga16", "live2")
    val v0 = st.currentVersion
    // simulate the mid-commit window of a LIVE txn: manifest written,
    // FIRST leg landed, second leg (live2) still in flight, manifest
    // not yet deleted — with the txn REGISTERED, exactly the state a
    // concurrent cold load sees
    val txn = new TableTxn("liveid123456", "ga16")
    MemCatalog.registerTxn(txn)
    try {
      val txnDir = java.nio.file.Paths.get(root, ".txn")
      java.nio.file.Files.createDirectories(txnDir)
      java.nio.file.Files.writeString(
        txnDir.resolve("liveid123456.pending"),
        s"live\t${v0 + 1}\nlive2\t${st2.currentVersion + 1}")
      val ref = writeLegFile(st, "liveleg")
      st.commitFilesAt(v0 + 1, Seq(ref._1), ref._2,
        Some("graft-txn:liveid123456"))
      // the cold-load recovery path — MUST leave the live txn alone
      TableTxn.recover(java.nio.file.Paths.get(root))
      assert(java.nio.file.Files.exists(
        st.commitLog.get.commitFilePath(v0 + 1)),
        "recover rolled back a LIVE transaction's landed leg")
      assert(java.nio.file.Files.exists(
        txnDir.resolve("liveid123456.pending")),
        "recover deleted a LIVE transaction's manifest")
    } finally MemCatalog.unregisterTxn(txn)
    // txn gone (simulated coordinator death): NOW recovery rolls back
    TableTxn.recover(java.nio.file.Paths.get(root))
    assert(!java.nio.file.Files.exists(
      st.commitLog.get.commitFilePath(v0 + 1)),
      "recovery must reap the crashed txn once it is no longer live")
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM ga16.live").head().getLong(0)
      == 1L)
  }

  test("a branch store participates in a transaction atomically; " +
      "rollback resolves the branch directory, not root/<branch>") {
    setup()
    spark.sql("DROP TABLE IF EXISTS ga16.bt")
    spark.sql("DROP TABLE IF EXISTS ga16.aux")
    spark.sql("CREATE TABLE ga16.bt (k BIGINT, s STRING)")
    spark.sql("CREATE TABLE ga16.aux (k BIGINT, s STRING)")
    spark.sql("INSERT INTO ga16.bt VALUES (1, 'base')")
    spark.sql("INSERT INTO ga16.aux VALUES (1, 'base')")
    spark.sql("ALTER TABLE ga16.bt CREATE BRANCH dev").collect()
    // happy path: branch leg + table leg advance together
    MemCatalog.inTransaction(spark, "ga16") { txn =>
      spark.sql("SELECT 2L AS k, 'b' AS s").writeTo("ga16.bt.branch_dev")
        .option("graft.txn.id", txn.id).append()
      spark.sql("SELECT 2L AS k, 'b' AS s").writeTo("ga16.aux")
        .option("graft.txn.id", txn.id).append()
    }
    assert(spark.sql("SELECT count(*) FROM ga16.bt.branch_dev")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM ga16.aux")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM ga16.bt")
      .head().getLong(0) == 1L, "base table must not see the branch leg")

    // slot theft on the TABLE leg: the BRANCH leg must roll back too
    val va = MaintenanceSql.storeFor(spark, "ga16", "aux").currentVersion
    val vb = Branches.storeOf(spark, "ga16", "bt", "dev").get.currentVersion
    java.nio.file.Files.createFile(java.nio.file.Paths.get(root, "aux",
      f"${va + 1}%08d.commit"))
    intercept[java.util.ConcurrentModificationException] {
      MemCatalog.inTransaction(spark, "ga16") { txn =>
        spark.sql("SELECT 3L AS k, 'c' AS s").writeTo("ga16.bt.branch_dev")
          .option("graft.txn.id", txn.id).append()
        spark.sql("SELECT 3L AS k, 'c' AS s").writeTo("ga16.aux")
          .option("graft.txn.id", txn.id).append()
      }
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "aux",
      f"${va + 1}%08d.commit"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root,
      ".branches", "bt", "dev", f"${vb + 1}%08d.commit")),
      "branch leg commit survived the rollback")
    // no phantom root/dev table directory was ever touched
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "dev")))
    assert(spark.sql("SELECT count(*) FROM ga16.bt.branch_dev")
      .head().getLong(0) == 2L, "branch must stay at its pre-txn state")

    // crash recovery across restart: branch leg landed, table leg not
    // (fresh handles — the rollback above invalidated the caches)
    val bs2 = Branches.storeOf(spark, "ga16", "bt", "dev").get
    val txnDir = java.nio.file.Paths.get(root, ".txn")
    java.nio.file.Files.createDirectories(txnDir)
    java.nio.file.Files.writeString(txnDir.resolve("brcrash00001.pending"),
      s".branches/bt/dev\t${bs2.currentVersion + 1}\naux\t${va + 1}")
    val ref = writeLegFile(bs2, "brleg")
    bs2.commitFilesAt(bs2.currentVersion + 1, Seq(ref._1), ref._2,
      Some("graft-txn:brcrash00001"))
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM ga16.bt.branch_dev")
      .head().getLong(0) == 2L,
      "crashed branch leg must roll back on recovery")
    assert(!java.nio.file.Files.exists(
      txnDir.resolve("brcrash00001.pending")))
  }

  test("fast-forward crash window: recovery deletes the orphan suffix; " +
      "a complete publication survives") {
    setup()
    spark.sql("DROP TABLE IF EXISTS ga16.prod")
    spark.sql("CREATE TABLE ga16.prod (k BIGINT)")
    spark.sql("INSERT INTO ga16.prod VALUES (1)")
    spark.sql("CREATE TABLE ga16.wap SHALLOW CLONE ga16.prod").collect()
    spark.sql("INSERT INTO ga16.wap VALUES (2)") // base+1
    spark.sql("INSERT INTO ga16.wap VALUES (3)") // base+2
    val t = MaintenanceSql.storeFor(spark, "ga16", "prod")
    val c = MaintenanceSql.storeFor(spark, "ga16", "wap")
    val tLog = t.commitLog.get
    val cLog = c.commitLog.get
    val base = t.currentVersion
    val head = c.currentVersion

    // simulate the crash: marker written, ONLY base+2 linked (the
    // publication order), process dies before base+1
    val txnDir = java.nio.file.Paths.get(root, ".txn")
    java.nio.file.Files.createDirectories(txnDir)
    val body = new StringBuilder
    body ++= s"prod\t$base\t$head\n"
    (base + 1 to head).foreach { w =>
      val ss = if (java.nio.file.Files.exists(cLog.statsFilePath(w)))
        sha256(cLog.statsFilePath(w)) else "-"
      body ++= s"$w\t${sha256(cLog.commitFilePath(w))}\t$ss\n"
    }
    java.nio.file.Files.writeString(
      txnDir.resolve("ff-crash0001.ffpending"), body.result())
    java.nio.file.Files.createLink(tLog.commitFilePath(base + 2),
      cLog.commitFilePath(base + 2))

    // restart: recovery must delete the invisible orphan
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM ga16.prod").head().getLong(0)
      == 1L)
    assert(!java.nio.file.Files.exists(tLog.commitFilePath(base + 2)),
      "orphan base+2 commit survived recovery")
    assert(!java.nio.file.Files.exists(
      txnDir.resolve("ff-crash0001.ffpending")))
    // the poison scenario from the advisory: an unrelated write lands
    // base+1 — history must NOT absorb the branch suffix
    spark.sql("INSERT INTO ga16.prod VALUES (100)")
    assert(spark.sql("SELECT sum(k) FROM ga16.prod").head().getLong(0)
      == 101L, "orphan suffix leaked into table history")
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT sum(k) FROM ga16.prod").head().getLong(0)
      == 101L)

    // a COMPLETE publication with a leftover marker survives recovery
    spark.sql("DROP TABLE IF EXISTS ga16.prod2")
    spark.sql("CREATE TABLE ga16.prod2 (k BIGINT)")
    spark.sql("INSERT INTO ga16.prod2 VALUES (1)")
    spark.sql("CREATE TABLE ga16.wap2 SHALLOW CLONE ga16.prod2").collect()
    spark.sql("INSERT INTO ga16.wap2 VALUES (2)")
    val t2 = MaintenanceSql.storeFor(spark, "ga16", "prod2")
    val c2 = MaintenanceSql.storeFor(spark, "ga16", "wap2")
    val b2 = t2.currentVersion
    val h2 = c2.currentVersion
    val body2 = new StringBuilder
    body2 ++= s"prod2\t$b2\t$h2\n"
    (b2 + 1 to h2).foreach { w =>
      val ss = if (java.nio.file.Files.exists(c2.commitLog.get
          .statsFilePath(w))) sha256(c2.commitLog.get.statsFilePath(w))
        else "-"
      body2 ++= s"$w\t${sha256(c2.commitLog.get.commitFilePath(w))}\t$ss\n"
    }
    java.nio.file.Files.writeString(
      txnDir.resolve("ff-done0001.ffpending"), body2.result())
    (b2 + 1 to h2).foreach { w =>
      if (java.nio.file.Files.exists(c2.commitLog.get.statsFilePath(w)))
        java.nio.file.Files.createLink(t2.commitLog.get.statsFilePath(w),
          c2.commitLog.get.statsFilePath(w))
      java.nio.file.Files.createLink(t2.commitLog.get.commitFilePath(w),
        c2.commitLog.get.commitFilePath(w))
    }
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM ga16.prod2").head().getLong(0)
      == 2L, "complete fast-forward must survive recovery")
    assert(!java.nio.file.Files.exists(
      txnDir.resolve("ff-done0001.ffpending")))
  }

  test("a stale-format checkpoint is rejected deterministically; cold " +
      "load falls back to full replay") {
    setup()
    spark.sql("DROP TABLE IF EXISTS ga16.ckv")
    spark.sql("CREATE TABLE ga16.ckv (k BIGINT, s STRING)")
    (1 to 17).foreach(i => spark.sql(s"INSERT INTO ga16.ckv VALUES ($i, 'x$i')"))
    val dir = java.nio.file.Paths.get(root, "ckv")
    val ckpts = {
      val s = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(
          _.getFileName.toString.matches("\\d{8}\\.checkpoint")).toVector
      } finally s.close()
    }
    assert(ckpts.nonEmpty, "expected a checkpoint after 17 commits")
    // simulate a PRE-HEADER (stale-layout) checkpoint: strip the
    // 8-byte magic+version header so the payload starts at `base` —
    // exactly the shape the old format wrote
    ckpts.foreach { p =>
      val bytes = java.nio.file.Files.readAllBytes(p)
      java.nio.file.Files.write(p, bytes.drop(8))
    }
    MemCatalog.simulateRestart()
    assert(spark.sql("SELECT count(*) FROM ga16.ckv").head().getLong(0)
      == 17L, "cold load must fall back to full replay on a stale " +
        "checkpoint format")
    assert(spark.sql("SELECT sum(k) FROM ga16.ckv").head().getLong(0)
      == (1 to 17).sum.toLong)
  }

  /** One real single-row data file into `store`'s data dir (a
    * hand-rolled txn leg, same shape as TableTxnSpec's). */
  private def writeLegFile(store: MemStore,
      tag: String): (FileRef, CommitStats) = {
    val schema = store.physSchema
    val name = s"$tag-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val w = ParquetRowIO.writer(
      java.nio.file.Paths.get(store.dataDirStr.get, name).toString, schema)
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](99L,
        org.apache.spark.unsafe.types.UTF8String.fromString("leg")))
    val acc = new CommitStats.Acc(schema)
    w.write(row); acc.add(row)
    w.close()
    (FileRef(name, 1L, Some(acc.result)), acc.result)
  }
}
