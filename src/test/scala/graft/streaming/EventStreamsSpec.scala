package graft.streaming

import graft.SparkTestBase

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkTestBase {

  private def microsOf(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli * 1000L

  // (event_id, ts nanos, user_id, event_type, value)
  private def row(id: Long, iso: String, user: Long, typ: String, v: Double) =
    (id, microsOf(iso) * 1000L, user, typ, v)

  test("windowed stats aggregate a real micro-batch stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = EventStreams.windowedStats(df, "1 minute", "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("complete").start()
    mem.addData(
      row(1, "2026-01-01T10:00:10Z", 1, "click", 1.0),
      row(2, "2026-01-01T10:00:40Z", 2, "click", 3.0),
      row(3, "2026-01-01T10:01:10Z", 1, "view", 5.0))
    q.processAllAvailable(); q.stop()

    val out = spark.sql(
      "SELECT event_type, n_events, sum_value FROM win_stats ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("click", 2L, 4.0), ("view", 1L, 5.0)))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = EventStreams.dedupByEventId(df)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData(
      row(1, "2026-01-01T10:00:10Z", 1, "click", 1.0),
      row(1, "2026-01-01T10:00:10Z", 1, "click", 1.0), // exact dup
      row(2, "2026-01-01T10:00:20Z", 1, "click", 2.0))
    q.processAllAvailable(); q.stop()

    assert(spark.table("dedup_out").count() == 2)
  }

  test("withinWatermark dedup catches retries re-stamped with a new timestamp") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = EventStreams.dedupByIdWithinWatermark(df)
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    mem.addData(
      row(1, "2026-01-01T10:00:10Z", 1, "click", 1.0),
      row(1, "2026-01-01T10:00:12Z", 1, "click", 1.0), // retry, re-stamped
      row(2, "2026-01-01T10:00:20Z", 1, "click", 2.0))
    q.processAllAvailable(); q.stop()

    // the re-stamped retry is a DIFFERENT (id, time) pair — the plain
    // keyed dedup would pass it; within-watermark id dedup drops it
    assert(spark.table("dedup_wm_out").count() == 2)
  }

  test("streaming Markov transitions carry state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.transitions(mem.toDS())
      .writeStream.format("memory").queryName("markov_out")
      .outputMode("append").start()
    mem.addData(
      Event(1, 1000L, 7, "view", 0.0),
      Event(2, 2000L, 7, "click", 0.0),
      Event(3, 1500L, 8, "signup", 0.0))
    q.processAllAvailable()
    // second micro-batch: the (click -> purchase) transition for user 7
    // spans the batch boundary — only carried state can emit it
    mem.addData(Event(4, 3000L, 7, "purchase", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("markov_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((7L, "view", "click"), (7L, "click", "purchase")))
  }

  test("a late cross-batch event older than the stored state is dropped, not inverted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.transitions(mem.toDS())
      .writeStream.format("memory").queryName("markov_late_out")
      .outputMode("append").start()
    mem.addData(
      Event(1, 1000L, 7, "view", 0.0),
      Event(2, 3000L, 7, "purchase", 0.0))
    q.processAllAvailable()
    // late arrival: timestamp BETWEEN the two already-processed events.
    // Pre-fix it would have been treated as newest, emitting the
    // inverted (purchase -> click) and corrupting the state to "click";
    // the ordering contract drops it instead.
    mem.addData(Event(3, 2000L, 7, "click", 0.0))
    q.processAllAvailable()
    // state must still be "purchase": the next in-order event chains off it
    mem.addData(Event(4, 4000L, 7, "refund", 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("markov_late_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((7L, "view", "purchase"), (7L, "purchase", "refund")))
  }

  test("transformWithState transitions agree with the legacy-API path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withConf("spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[Event]
      val q = EventStreams.transitionsTws(mem.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      mem.addData(
        Event(1, 1000L, 7, "view", 0.0),
        Event(2, 2000L, 7, "click", 0.0),
        Event(3, 1500L, 8, "signup", 0.0))
      q.processAllAvailable()
      mem.addData(Event(4, 3000L, 7, "purchase", 0.0)) // cross-batch
      q.processAllAvailable(); q.stop()
      val got = spark.table("tws_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // identical to the flatMapGroupsWithState path on the same feed
      assert(got == Set((7L, "view", "click"), (7L, "click", "purchase")))
    }
  }

  test("stream-stream interval join matches clicks to preceding views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long, String, Double)]
    val views = MemoryStream[(Long, Long, Long, String, Double)]
    val cdf = clicks.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val vdf = views.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = EventStreams.clickViewJoin(cdf, vdf, within = "10 minutes")
      .writeStream.format("memory").queryName("cv_join")
      .outputMode("append").start()
    views.addData(
      row(100, "2026-01-01T10:00:00Z", 1, "view", 0.0), // 5 min before -> match
      row(101, "2026-01-01T09:40:00Z", 1, "view", 0.0), // 25 min before -> out of window
      row(102, "2026-01-01T10:10:00Z", 1, "view", 0.0), // AFTER the click -> no match
      row(103, "2026-01-01T10:00:00Z", 3, "view", 0.0)) // other user
    clicks.addData(
      row(1, "2026-01-01T10:05:00Z", 1, "click", 1.0),
      row(2, "2026-01-01T10:05:00Z", 2, "click", 1.0)) // user 2 has no views
    q.processAllAvailable(); q.stop()

    val out = spark.table("cv_join")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 100L)),
      s"exactly click 1 x view 100 must match, got ${out.toSeq}")
  }

  test("the reservoir UDA runs as streaming state (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = EventStreams.streamingMedian(df, maxSamples = 100)
      .writeStream.format("memory").queryName("stream_med")
      .outputMode("complete").start()
    mem.addData(row(1, "2026-01-01T10:00:01Z", 1, "m", 1.0))
    q.processAllAvailable()
    mem.addData(
      row(2, "2026-01-01T10:00:02Z", 1, "m", 2.0),
      row(3, "2026-01-01T10:00:03Z", 1, "m", 3.0))
    q.processAllAvailable(); q.stop()

    // exact regime across two micro-batches: median of {1,2,3} = 2
    val med = spark.table("stream_med").collect()(0).getDouble(1)
    assert(med == 2.0)
  }

  test("sessionization closes a session on an event-time gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMicros = 30L * 60 * 1000 * 1000 // 30 min

    val q = EventStreams.sessionize(mem.toDS(), gapMicros, idleTimeoutMs = 0L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(
      Event(1, microsOf("2026-01-01T10:00:00Z"), 7, "click", 1.0),
      Event(2, microsOf("2026-01-01T10:10:00Z"), 7, "click", 2.0),
      // 2h gap -> closes first session
      Event(3, microsOf("2026-01-01T12:30:00Z"), 7, "view", 4.0))
    q.processAllAvailable(); q.stop()

    val closed = spark.table("sessions").as[UserSession].collect()
    assert(closed.length == 1)
    assert(closed(0).userId == 7L)
    assert(closed(0).nEvents == 2L && closed(0).sumValue == 3.0)
    assert(closed(0).startMicros == microsOf("2026-01-01T10:00:00Z"))
    assert(closed(0).endMicros == microsOf("2026-01-01T10:10:00Z"))
  }

  test("burst scores prune the window, carry state, and match hand values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000
    val mem = MemoryStream[Event]
    val q = EventStreams.burstScores(mem.toDS(), hour)
      .writeStream.format("memory").queryName("bursts")
      .outputMode("append").start()
    mem.addData(
      Event(1, 1000L, 7, "purchase", 1.00),
      Event(2, 1000L + hour / 2, 7, "purchase", 2.00))
    q.processAllAvailable()
    // batch 2: third event still inside the first's hour (inclusive
    // boundary), fourth prunes the first two out
    mem.addData(
      Event(3, 1000L + hour, 7, "purchase", 4.00),
      Event(4, 1000L + 3 * hour, 7, "purchase", 8.00))
    q.processAllAvailable(); q.stop()
    val got = spark.table("bursts").as[BurstScore].collect()
      .sortBy(_.eventTimeMicros).map(b => (b.s1h, b.n1h)).toSeq
    assert(got == Seq((100L, 1L), (300L, 2L), (700L, 3L), (800L, 1L)))
  }

  test("burst stream equals the q211 batch RANGE frame on the fixture feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev0 = graft.sources.Tables.load(spark, sf0001, "events")
    val feed = ev0.where(col("event_type") === "purchase")
      .select(col("event_id"), graft.sources.Tables.tsMicros(ev0).as("t"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("t"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[Event]
    val q = EventStreams.burstScores(mem.toDS())
      .writeStream.format("memory").queryName("bursts_fixture")
      .outputMode("append").start()
    feed.grouped(200).foreach { batch =>
      mem.addData(batch.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("bursts_fixture").as[BurstScore].collect()
      .groupBy(_.userId)
      .map { case (u, rs) => u -> (rs.length.toLong, rs.map(_.s1h).max,
        rs.count(_.n1h >= 2).toLong, rs.map(_.s1h).sum) }
    val batch = graft.SparkEntry.queries("q211_trailing_window")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(streamed.size == batch.size)
    streamed.foreach { case (u, s) => assert(s == batch(u), s"user $u") }
  }
}
