package graft.streaming

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The append-mode watermark contract the windowed streams rely on:
  * a window only EMITS once the watermark passes its end, and an
  * event arriving behind the watermark is DROPPED — it can neither
  * re-open the finalized window nor corrupt a later one. */
class WatermarkDropSpec extends SparkTestBase {

  import spark.implicits._

  test("append mode finalizes windows at the watermark and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Double)]
    // reuse the production transform via its own schema contract
    val src = mem.toDF().toDF("event_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
    val q = EventStreams.windowedStats(src,
      windowLen = "1 minute", watermark = "2 minutes")
      .writeStream.format("memory").queryName("wm_drop_out")
      .outputMode("append").start()

    def minute(m: Int, s: Int = 0): Long = (m * 60L + s) * 1000000L
    // window [10:00, 10:01): three clicks
    mem.addData((1L, minute(600), "click", 1.0),
      (2L, minute(600, 20), "click", 1.0), (3L, minute(600, 40), "click", 1.0))
    q.processAllAvailable()
    // nothing emits yet: the watermark has not passed the window end
    assert(spark.table("wm_drop_out").count() == 0)
    // an event far ahead will advance the watermark past 10:01 —
    // batch N runs under the watermark computed from batch N-1, so
    // the finalize lands in the NEXT batch
    mem.addData((4L, minute(620), "view", 1.0))
    q.processAllAvailable()
    // this batch runs with watermark 618: the [10:00, 10:01) window
    // finalizes, and the batch's own LATE click (behind the
    // watermark) is DROPPED — it neither re-opens the window nor
    // creates a correction row
    mem.addData((5L, minute(600, 50), "click", 1.0))
    q.processAllAvailable()
    val after = spark.table("wm_drop_out")
      .select(col("event_type"), col("n_events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(after == Map("click" -> 3L),
      s"expected only the finalized 3-click window: $after")
  }
}
