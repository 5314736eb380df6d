package graft.streaming

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint recovery — the property that makes streaming pipelines
  * restartable: a NEW query instance resuming from the same
  * checkpoint must pick up exactly where the old one stopped, with
  * the already-committed batches neither reprocessed nor lost
  * (exactly-once file sink semantics). */
class StreamRecoverySpec extends SparkTestBase {

  // fresh per-run root: concurrent suites on one host must not share
  // checkpoint/source dirs
  private val root = java.nio.file.Files
    .createTempDirectory("graft_stream_recovery").toString

  private def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
    val dir = new java.io.File(s"$root/in")
    dir.mkdirs()
    val tmp = new java.io.File(dir, s".$name.tmp")
    val out = new java.io.PrintWriter(tmp, "UTF-8")
    rows.foreach { case (id, t) => out.println(s"""{"doc_id":$id,"text":"$t"}""") }
    out.close()
    // atomic move (throws on failure — a silently missing batch would
    // surface as a baffling empty-output assertion)
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(dir, s"$name.json").toPath)
  }

  test("a restarted query resumes from the checkpoint exactly once") {

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def stream = spark.readStream.schema(schema).json(s"$root/in")
      .select(col("doc_id"), upper(col("text")).as("shout"))

    writeBatch("b1", Seq((1L, "alpha"), (2L, "beta")))
    val q1 = stream.writeStream.format("parquet")
      .option("checkpointLocation", s"$root/ckpt")
      .option("path", s"$root/out").start()
    q1.processAllAvailable(); q1.stop()

    // second file lands while no query is running; a fresh query
    // instance on the SAME checkpoint must process only the new file
    writeBatch("b2", Seq((3L, "gamma")))
    val q2 = stream.writeStream.format("parquet")
      .option("checkpointLocation", s"$root/ckpt")
      .option("path", s"$root/out").start()
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(s"$root/out")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((1L, "ALPHA"), (2L, "BETA"), (3L, "GAMMA")),
      s"restart must be exactly-once, got $out")
  }
}
