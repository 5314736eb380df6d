package graft.streaming

import graft.SparkTestBase
import graft.sources.MemCatalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Change Data Feed as a STREAMING SOURCE
  * (`spark.readStream.table("cat.t.changes")`): change rows —
  * inserts, deletes, update pre/post images — delivered with
  * commit-version offsets, so a CDC consumer maintains exact derived
  * state from the stream alone. Pins: the streamed feed across
  * uneven micro-batches equals batch `table_changes` over the same
  * range exactly; a mart folded from the STREAM equals a direct
  * aggregate of the table's final state; checkpointed restart resumes
  * with zero re-delivery; an offset below retention fails loudly. */
class StreamCdfSourceSpec extends SparkTestBase {

  private type Change = (String, Long, Long, Option[String])

  private val delivered =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[Change]())

  private def startFeed(ckpt: String) =
    spark.readStream.table("graftcdf.t1.changes").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          delivered.add((r.getString(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getString(3)))))
        ()
      }
      .start()

  private def batchFeed(from: Int, to: Int): Set[Change] =
    MemCatalog.tableChanges(spark, "graftcdf", "t1", from, to).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet

  test("streamed CDF == batch table_changes; mart from the stream == direct aggregate; restart + retention guard") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_src")
    val ckpt = root.resolve("ckpt").toString
    spark.conf.set("spark.sql.catalog.graftcdf",
      classOf[MemCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcdf.path",
      root.resolve("cat").toString)
    spark.sql("DROP TABLE IF EXISTS graftcdf.t1")
    spark.sql("CREATE TABLE graftcdf.t1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graftcdf.t1 VALUES (1, 'a'), (2, 'b'), (3, 'c')") // v1

    import scala.jdk.CollectionConverters._
    val q1 = startFeed(ckpt)
    q1.processAllAvailable()
    assert(delivered.asScala.toSet == batchFeed(1, 1),
      s"initial CDF load diverged: $delivered vs ${batchFeed(1, 1)}")

    // batch 2: a MERGE mixing update, insert, AND delete — the feed
    // must stream ALL of it (not the insert-only posture of the plain
    // table stream), pre-images included
    spark.sql(
      """MERGE INTO graftcdf.t1 t
        |USING (SELECT * FROM VALUES (2, 'B'), (9, 'z') AS s(k, v)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
        |""".stripMargin)                                                    // v2
    q1.processAllAvailable()
    // batch 3: plain append (uneven batch sizes by construction)
    spark.sql("INSERT INTO graftcdf.t1 VALUES (10, 'j'), (11, 'k')")         // v3
    q1.processAllAvailable()
    assert(delivered.asScala.toSet == batchFeed(1, 3),
      "streamed feed != batch table_changes over the same versions")
    assert(delivered.asScala.exists(_._1 == "update_preimage") &&
      delivered.asScala.exists(_._1 == "delete"),
      s"feed must carry pre-images and deletes: $delivered")
    q1.stop()

    // checkpointed restart: only the NEW commit streams
    spark.sql("DELETE FROM graftcdf.t1 WHERE k = 10")                        // v4
    val before = delivered.size()
    val q2 = startFeed(ckpt)
    q2.processAllAvailable()
    q2.stop()
    val fresh = delivered.asScala.drop(before).toSet
    assert(fresh == Set(("delete", 4L, 10L, Some("j"))),
      s"restart must deliver exactly v4's changes, got $fresh")

    // the canonical consumer: fold the STREAMED feed into a per-key
    // state (+post/insert, -pre/delete) — must equal the table's
    // actual final state, derived independently
    val folded = delivered.asScala.groupBy(_._3).view.mapValues { cs =>
      cs.foldLeft((0L, Option.empty[String])) { case ((n, _), c) =>
        c._1 match {
          case "insert" | "update_postimage" => (n + 1, c._4)
          case _ => (n - 1, None)
        }
      }
    }.toMap.collect { case (k, (n, v)) if n > 0 => (k, v.get) }
    val direct = spark.table("graftcdf.t1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(folded == direct,
      s"mart from the stream diverged: $folded vs $direct")

    // batch SQL surface: the `.changes` metadata table with a pushed
    // version filter equals the helper over the same range
    val sqlFeed = spark.sql(
      """SELECT _change_type, _commit_version, k, v
        |FROM graftcdf.t1.changes WHERE _commit_version >= 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getString(3)))).toSet
    assert(sqlFeed == batchFeed(2, 4), sqlFeed.toString)

    // retention vs checkpoints: a CDF offset below the retained
    // window must fail loudly, not silently re-deliver
    MemCatalog.expireSnapshots("graftcdf", "t1", before = 3)
    val e = intercept[Exception] {
      val table = spark.sessionState.catalogManager
        .catalog("graftcdf").asInstanceOf[MemCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("t1"), "changes"))
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
