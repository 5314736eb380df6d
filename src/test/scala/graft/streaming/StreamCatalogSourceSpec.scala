package graft.streaming

import graft.SparkTestBase
import graft.sources.MemCatalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The catalog table as a STREAMING SOURCE (`spark.readStream.table`):
  * offsets are commit VERSIONS off the delta log — the first batch
  * delivers the existing table, every later batch exactly the rows
  * inserted by the commits in its offset range, and a checkpointed
  * restart resumes at the committed version without re-delivery. The
  * streaming half of the lakehouse loop the catalog already writes
  * (foreachBatch MERGE in): downstream jobs follow a continuously
  * ingesting table without ever rescanning it. */
class StreamCatalogSourceSpec extends SparkTestBase {

  private val delivered =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, String)]())

  private def startFollow(ckpt: String) =
    spark.readStream.table("graftsrc.src1").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          delivered.add((r.getLong(0), r.getString(1))))
        ()
      }
      .start()

  test("version-offset micro-batches: initial load, appends, merge inserts, checkpointed restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_src")
    val ckpt = root.resolve("ckpt").toString
    spark.conf.set("spark.sql.catalog.graftsrc",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsrc.path",
      root.resolve("cat").toString)
    spark.sql("DROP TABLE IF EXISTS graftsrc.src1")
    spark.sql("CREATE TABLE graftsrc.src1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftsrc.src1 VALUES (1, 'a'), (2, 'b')") // v1

    import scala.jdk.CollectionConverters._
    val q1 = startFollow(ckpt)
    q1.processAllAvailable()
    assert(delivered.asScala.toSet == Set((1L, "a"), (2L, "b")),
      s"initial load wrong: $delivered")

    spark.sql("INSERT INTO graftsrc.src1 VALUES (3, 'c')")            // v2
    q1.processAllAvailable()
    assert(delivered.asScala.toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")), delivered.toString)

    // a MERGE mixing an update and an insert: only the INSERTED row
    // streams (the ignore-changes posture — updates rewrite history
    // the follower already consumed)
    spark.sql(
      """MERGE INTO graftsrc.src1 t
        |USING (SELECT * FROM VALUES (2, 'B'), (7, 'g') AS s(k, v)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin) // v3
    q1.processAllAvailable()
    assert(delivered.asScala.toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (7L, "g")), delivered.toString)
    q1.stop()

    // restart from the checkpoint: nothing re-delivers; new commits do
    spark.sql("INSERT INTO graftsrc.src1 VALUES (8, 'h')")            // v4
    val before = delivered.size()
    val q2 = startFollow(ckpt)
    q2.processAllAvailable()
    q2.stop()
    val fresh = delivered.asScala.drop(before).toSet
    assert(fresh == Set((8L, "h")),
      s"restart must deliver exactly the new commit, got $fresh")

    // retention vs checkpoints: an offset that predates the retained
    // window must fail LOUDLY — silently resuming would re-deliver
    // the consolidated base as duplicates
    MemCatalog.expireSnapshots("graftsrc", "src1", before = 3)
    val e = intercept[Exception] {
      // drive the stream surface directly at the stale offset
      val table = spark.sessionState.catalogManager
        .catalog("graftsrc").asInstanceOf[MemCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array.empty, "src1"))
      val stream = table
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util
          .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
        .build()
        .toMicroBatchStream("/tmp/unused")
      stream.planInputPartitions(
        stream.deserializeOffset("0"), stream.deserializeOffset("4"))
    }
    assert(e.getMessage.contains("predates the retained window"),
      e.getMessage)
  }
}
