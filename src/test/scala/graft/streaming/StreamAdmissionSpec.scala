package graft.streaming

import graft.SparkTestBase
import graft.sources.MemCatalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming ADMISSION CONTROL on the catalog source
  * (`maxRowsPerTrigger` / `maxVersionsPerTrigger` +
  * `Trigger.AvailableNow`): a 100 TB table read as a stream must not
  * become one giant first micro-batch — limits bound each batch to
  * whole versions within a row budget (at least one version always
  * serves, the Delta maxFilesPerTrigger convention), and AvailableNow
  * drains up to the start-time head in bounded batches then STOPS —
  * the backfill shape. */
class StreamAdmissionSpec extends SparkTestBase {

  import scala.jdk.CollectionConverters._

  private def setup(name: String): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_adm")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[MemCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.path",
      root.resolve("cat").toString)
    root.resolve("ckpt").toString
  }

  test("maxVersionsPerTrigger bounds each batch to N versions") {
    val ckpt = setup("graftadm")
    spark.sql("DROP TABLE IF EXISTS graftadm.a1")
    spark.sql("CREATE TABLE graftadm.a1 (k BIGINT)")
    spark.sql("INSERT INTO graftadm.a1 VALUES (1), (2)") // v1
    spark.sql("INSERT INTO graftadm.a1 VALUES (3)")      // v2
    spark.sql("INSERT INTO graftadm.a1 VALUES (4), (5)") // v3
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("graftadm.a1")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.add(b.count()); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val sizes = batches.asScala.filter(_ > 0).toSeq
    assert(sizes == Seq(2L, 1L, 2L),
      s"one version per batch expected: $sizes")
  }

  test("maxRowsPerTrigger packs whole versions within the budget; an " +
      "oversized single version still serves") {
    val ckpt = setup("graftadm")
    spark.sql("DROP TABLE IF EXISTS graftadm.a2")
    spark.sql("CREATE TABLE graftadm.a2 (k BIGINT)")
    spark.sql("INSERT INTO graftadm.a2 VALUES (1), (2)")       // v1: 2 rows
    spark.sql("INSERT INTO graftadm.a2 VALUES (3), (4)")       // v2: 2 rows
    // v3: 6 rows — alone exceeds the budget of 4, must still serve
    spark.sql(
      "INSERT INTO graftadm.a2 VALUES (5), (6), (7), (8), (9), (10)")
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream
      .option("maxRowsPerTrigger", "4")
      .table("graftadm.a2")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.add(b.count()); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val sizes = batches.asScala.filter(_ > 0).toSeq
    assert(sizes == Seq(4L, 6L),
      s"expected [v1+v2 = 4 rows, oversized v3 = 6 rows]: $sizes")
  }

  test("the CDF streaming source honors the same limits: change rows " +
      "budget per batch at version grain") {
    val ckpt = setup("graftadm")
    spark.sql("DROP TABLE IF EXISTS graftadm.a4")
    spark.sql("CREATE TABLE graftadm.a4 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftadm.a4 VALUES (1, 'a'), (2, 'b')") // v1: 2
    // v2: an UPDATE = 2 change rows (pre + post image)
    spark.sql("UPDATE graftadm.a4 SET v = 'B' WHERE k = 2")
    spark.sql("INSERT INTO graftadm.a4 VALUES (3, 'c')")           // v3: 1
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream
      .option("maxRowsPerTrigger", "2")
      .table("graftadm.a4.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.add(b.count()); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val sizes = batches.asScala.filter(_ > 0).toSeq
    // v1 (2 rows) fills a batch; v2 (2 change rows) the next; v3 last
    assert(sizes == Seq(2L, 2L, 1L),
      s"CDF batches must pack whole versions within the budget: $sizes")
  }

  test("Trigger.AvailableNow drains to the start-time head in bounded " +
      "batches, then terminates") {
    val ckpt = setup("graftadm")
    spark.sql("DROP TABLE IF EXISTS graftadm.a3")
    spark.sql("CREATE TABLE graftadm.a3 (k BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graftadm.a3 VALUES ($i)"))
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("graftadm.a3")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.add(b.count()); ()
      }.start()
    assert(q.awaitTermination(60000),
      "AvailableNow must terminate after draining")
    val sizes = batches.asScala.filter(_ > 0).toSeq
    assert(sizes == Seq(1L, 1L, 1L, 1L),
      s"expected 4 bounded single-version batches: $sizes")
  }
}
