package graft.sources

import graft.SparkTestBase

/** CROSS-PROCESS transaction recovery: the writer dies mid-commit and
  * a SECOND JVM (forked, no shared state) runs the load-time recovery
  * pass. This replaces the documented single-writer caveat with a
  * tested contract:
  *
  *  1. incomplete txn (manifest + one landed leg) — the foreign
  *     process rolls the landed leg BACK;
  *  2. complete txn (manifest + all legs) — rolled FORWARD (kept);
  *  3. a FOREIGN commit occupying a leg slot is NEVER touched (the
  *     hash/tag match protects real history);
  *  4. a crashed fast-forward's orphan suffix links are reaped by the
  *     same foreign-process pass.
  */
class TxnRecoverySpec extends SparkTestBase {

  private val root =
    java.nio.file.Files.createTempDirectory("graft_xproc").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gxp", classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.gxp.path", root)
  }

  /** Fork the recovery probe against `root` in a fresh JVM. */
  private def foreignRecover(): Unit = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val p = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.sources.TxnRecoveryProbe", root)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0 && out.contains("recovery-complete"),
      s"probe failed (exit $code):\n$out")
  }

  private def writeLegFile(store: MemStore,
      tag: String): (FileRef, CommitStats) = {
    val schema = store.physSchema
    val name = s"$tag-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val w = ParquetRowIO.writer(
      java.nio.file.Paths.get(store.dataDirStr.get, name).toString, schema)
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](99L))
    val acc = new CommitStats.Acc(schema)
    w.write(row); acc.add(row)
    w.close()
    (FileRef(name, 1L, Some(acc.result)), acc.result)
  }

  test("a foreign process rolls an incomplete txn back, keeps a " +
      "complete one, and never touches a foreign slot winner") {
    setup()
    Seq("a", "b", "c", "d").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS gxp.$t")
      spark.sql(s"CREATE TABLE gxp.$t (k BIGINT)")
      spark.sql(s"INSERT INTO gxp.$t VALUES (1)")
    }
    val txnDir = java.nio.file.Paths.get(root, ".txn")
    java.nio.file.Files.createDirectories(txnDir)
    def store(t: String) = MaintenanceSql.storeFor(spark, "gxp", t)

    // 1) INCOMPLETE: manifest names (a, b); only a's leg landed
    val (va, vb) = (store("a").currentVersion, store("b").currentVersion)
    java.nio.file.Files.writeString(txnDir.resolve("xp0000000001.pending"),
      s"a\t${va + 1}\nb\t${vb + 1}")
    val ra = writeLegFile(store("a"), "xpa")
    store("a").commitFilesAt(va + 1, Seq(ra._1), ra._2,
      Some("graft-txn:xp0000000001"))

    // 2) COMPLETE: manifest names (c, d); both legs landed
    val (vc, vd) = (store("c").currentVersion, store("d").currentVersion)
    java.nio.file.Files.writeString(txnDir.resolve("xp0000000002.pending"),
      s"c\t${vc + 1}\nd\t${vd + 1}")
    val rc = writeLegFile(store("c"), "xpc")
    store("c").commitFilesAt(vc + 1, Seq(rc._1), rc._2,
      Some("graft-txn:xp0000000002"))
    val rd = writeLegFile(store("d"), "xpd")
    store("d").commitFilesAt(vd + 1, Seq(rd._1), rd._2,
      Some("graft-txn:xp0000000002"))

    // 3) FOREIGN SLOT WIN: a manifest claims b's next slot, but the
    // commit actually there is a concurrent writer's (no txn tag)
    val bLog = store("b").commitLog.get
    java.nio.file.Files.writeString(txnDir.resolve("xp0000000003.pending"),
      s"b\t${vb + 1}")
    val rb = writeLegFile(store("b"), "xpf")
    store("b").commitFilesAt(vb + 1, Seq(rb._1), rb._2, txnTag = None)

    // the WRITER process "dies" here; a SECOND process recovers
    foreignRecover()

    // this JVM restarts cold and observes the recovered state
    MemCatalog.simulateRestart()
    def count(t: String) = spark.sql(s"SELECT count(*) FROM gxp.$t")
      .head().getLong(0)
    assert(count("a") == 1L, "incomplete txn leg must roll back")
    assert(count("b") == 2L,
      "the foreign writer's slot win must NEVER roll back")
    assert(count("c") == 2L && count("d") == 2L,
      "complete txn must roll forward")
    assert(java.nio.file.Files.exists(bLog.commitFilePath(vb + 1)))
    val left = java.nio.file.Files.list(txnDir)
    try {
      import scala.jdk.CollectionConverters._
      assert(left.iterator().asScala.isEmpty,
        "all manifests must be cleared after recovery")
    } finally left.close()
  }

  test("a foreign process reaps a crashed fast-forward's orphan suffix") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gxp.prod")
    spark.sql("CREATE TABLE gxp.prod (k BIGINT)")
    spark.sql("INSERT INTO gxp.prod VALUES (1)")
    spark.sql("CREATE TABLE gxp.wap SHALLOW CLONE gxp.prod").collect()
    spark.sql("INSERT INTO gxp.wap VALUES (2)") // base+1
    spark.sql("INSERT INTO gxp.wap VALUES (3)") // base+2
    val t = MaintenanceSql.storeFor(spark, "gxp", "prod")
    val c = MaintenanceSql.storeFor(spark, "gxp", "wap")
    val base = t.currentVersion
    val head = c.currentVersion
    def sha(p: java.nio.file.Path): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(java.nio.file.Files.readAllBytes(p))
      md.digest().map(b => f"$b%02x").mkString
    }
    val txnDir = java.nio.file.Paths.get(root, ".txn")
    java.nio.file.Files.createDirectories(txnDir)
    val body = new StringBuilder
    body ++= s"prod\t$base\t$head\n"
    (base + 1 to head).foreach { w =>
      val sf = c.commitLog.get.statsFilePath(w)
      val ss = if (java.nio.file.Files.exists(sf)) sha(sf) else "-"
      body ++= s"$w\t${sha(c.commitLog.get.commitFilePath(w))}\t$ss\n"
    }
    java.nio.file.Files.writeString(
      txnDir.resolve("ff-xproc001.ffpending"), body.result())
    java.nio.file.Files.createLink(t.commitLog.get.commitFilePath(base + 2),
      c.commitLog.get.commitFilePath(base + 2))

    foreignRecover()

    MemCatalog.simulateRestart()
    assert(!java.nio.file.Files.exists(
      t.commitLog.get.commitFilePath(base + 2)),
      "orphan suffix link must be reaped by the foreign process")
    assert(spark.sql("SELECT count(*) FROM gxp.prod").head().getLong(0)
      == 1L)
  }
}
