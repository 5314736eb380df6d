package graft.streaming

import graft.functions.GraftFunctions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One event after time normalization (events.ts arrives as raw
  * parquet nanos — see [[graft.sources.Tables.requiredConf]]). */
case class Event(eventId: Long, eventTimeMicros: Long, userId: Long,
    eventType: String, value: Double)

/** One first-order transition emitted by [[EventStreams.transitions]]. */
case class Transition(userId: Long, a: String, b: String)

private case class LastEvent(eventTimeMicros: Long, eventId: Long,
    eventType: String)

/** A gap-based user session produced by [[EventStreams.sessionize]]. */
case class BurstScore(userId: Long, eventTimeMicros: Long, cents: Long,
    s1h: Long, n1h: Long)

private case class BurstState(ts: Seq[Long], cs: Seq[Long])

case class UserSession(userId: Long, startMicros: Long, endMicros: Long,
    nEvents: Long, sumValue: Double)

private case class SessionState(startMicros: Long, endMicros: Long,
    nEvents: Long, sumValue: Double)

/** Structured Streaming surface over the `events` table shape
  * (SURVEY §2.2 "Streaming"). The reference has no streaming code —
  * its UDA is incremental by construction, and these transforms show
  * the same operators running under Spark's streaming engine.
  *
  * Every transform here is DataFrame-in → DataFrame-out and works
  * identically on a batch frame or a `readStream` frame; the specs
  * drive them through `MemoryStream` with real triggers.
  *
  * Scale posture: streaming state is bounded — windowed aggs expire by
  * watermark, dedup state is watermark-scoped, and sessionization
  * state is one small struct per active user with a processing-time
  * timeout. Nothing accumulates unboundedly on a 1000-executor
  * cluster.
  */
object EventStreams {

  /** `ts` → TIMESTAMP `event_time` (micros precision), adapting to
    * either fixture representation (raw nanos or native timestamp)
    * via [[graft.sources.Tables.tsMicros]]. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time",
      timestamp_micros(graft.sources.Tables.tsMicros(df)))

  /** Tumbling-window per-type stats with a late-data watermark.
    * Partial aggregation happens before the shuffle exactly as in the
    * batch plan; the watermark bounds state retention. */
  def windowedStats(events: DataFrame, windowLen: String = "1 minute",
      watermark: String = "5 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        max(col("value")).as("max_value"))

  /** Streaming exact dedup by event id, state scoped to the watermark
    * (duplicates arriving later than the watermark are already
    * impossible to distinguish — same trade every at-least-once
    * ingestion pipeline makes). */
  def dedupByEventId(events: DataFrame, watermark: String = "5 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicates("event_id", "event_time")

  /** Streaming dedup on the id ALONE with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`). [[dedupByEventId]] must carry
    * event_time in the dedup key for its state to expire, so a
    * retried event RE-STAMPED with a fresh timestamp slips through —
    * the common at-least-once producer behavior. This variant treats
    * any same-id record arriving inside the watermark horizon as a
    * duplicate while still expiring state, trading exactly that
    * horizon of memory for retry-proof semantics. */
  def dedupByIdWithinWatermark(events: DataFrame,
      watermark: String = "5 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** The reference UDA under streaming: per-type approximate median
    * over all events seen so far (complete output mode). The reservoir
    * buffer IS the streaming state — O(k) per group, merged
    * incrementally per micro-batch, the same contract the Impala UDA
    * lifecycle encodes (SURVEY §3.1). */
  def streamingMedian(events: DataFrame, maxSamples: Int): DataFrame = {
    GraftFunctions.register(events.sparkSession)
    events.groupBy(col("event_type"))
      .agg(GraftFunctions.appx_median_bounded_double(col("value"), maxSamples).as("med"))
  }

  /** Stream-stream interval join: each click enriched with the same
    * user's views from the preceding `within` window — the canonical
    * streaming enrichment shape (clicks ⋈ impressions). Both sides
    * carry watermarks AND the join condition bounds event time on both
    * sides, which is exactly what lets Spark expire buffered join
    * state instead of holding both streams forever. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
      watermark: String = "5 minutes", within: String = "10 minutes"): DataFrame = {
    val c = withEventTime(clicks).withWatermark("event_time", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("click_time"))
    val v = withEventTime(views).withWatermark("event_time", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("event_time").as("view_time"))
    c.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_time") >= col("click_time") - expr(s"INTERVAL $within") &&
          col("view_time") <= col("click_time"))
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("click_time"), col("view_time"))
  }

  /** Streaming first-order transition extraction — the
    * [[graft.queries.EventQueries]] q178 Markov model's streaming
    * twin. Per-user state is ONE [[LastEvent]] struct; each arriving
    * event emits the (prev → cur) transition and advances the state
    * ((time, eventId)-ordered within a micro-batch, matching the
    * batch `lead` window's ordering for in-order feeds). Downstream,
    * the transitions feed the same count aggregation as the batch
    * gate — counts are mergeable state, so the model maintains
    * incrementally as the stream runs.
    *
    * ORDERING CONTRACT: only per-user IN-ORDER feeds reproduce the
    * batch q178 model exactly (state is the single last event, not a
    * reorder buffer). An event arriving in a LATER micro-batch with a
    * (time, eventId) at or below the stored state is stale and is
    * DROPPED — emitting it as if newest would invert the transition —
    * so late data costs at most its own transition, never a corrupted
    * successor state. Cross-batch reordering that must be healed
    * exactly belongs to the batch path (recompute the window), the
    * standard lambda split. */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = it.toSeq.sortBy(e => (e.eventTimeMicros, e.eventId))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            if (!last.exists(l => e.eventTimeMicros < l.eventTimeMicros ||
                (e.eventTimeMicros == l.eventTimeMicros &&
                  e.eventId <= l.eventId))) {
              last.foreach(l => out += Transition(userId, l.eventType, e.eventType))
              last = Some(LastEvent(e.eventTimeMicros, e.eventId, e.eventType))
            } // else: stale arrival older than the stored state — drop
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** [[transitions]] re-expressed on Spark 4's `transformWithState`
    * — the arbitrary-state API that supersedes
    * `flatMapGroupsWithState` (typed per-key state HANDLES instead of
    * one opaque state value, RocksDB-backed with TTL support, timers
    * decoupled from output). Same semantics as the legacy-API path,
    * and the spec pins the two paths agree on the same feed —
    * requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def transitionsTws(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Per-event trailing-hour burst score — the streaming twin of the
    * q211 batch RANGE frame: state is the user's events inside the
    * last hour (pruned on every arrival, so state size is bounded by
    * the window's event capacity, never history). ORDERING CONTRACT
    * (the [[transitions]] discipline): per-user feeds must be
    * strictly increasing in event time; an arrival at or below the
    * newest stored timestamp is DROPPED — emitting it would
    * mis-window its successors — so late data costs at most its own
    * row, and the batch path heals exact reordering (the lambda
    * split). */
  def burstScores(events: Dataset[Event],
      windowMicros: Long = 3600L * 1000 * 1000): Dataset[BurstScore] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[BurstState, BurstScore](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[BurstState]) =>
          val sorted = it.toSeq.sortBy(_.eventTimeMicros)
          val out = Seq.newBuilder[BurstScore]
          var ts = state.getOption.map(_.ts).getOrElse(Seq.empty)
          var cs = state.getOption.map(_.cs).getOrElse(Seq.empty)
          sorted.foreach { e =>
            if (!ts.lastOption.exists(e.eventTimeMicros <= _)) {
              val cents = math.round(e.value * 100)
              val keepFrom = ts.indexWhere(_ >= e.eventTimeMicros - windowMicros)
              val (kts, kcs) =
                if (keepFrom < 0) (Seq.empty[Long], Seq.empty[Long])
                else (ts.drop(keepFrom), cs.drop(keepFrom))
              ts = kts :+ e.eventTimeMicros
              cs = kcs :+ cents
              out += BurstScore(userId, e.eventTimeMicros, cents,
                cs.sum, cs.length.toLong)
            }
          }
          state.update(BurstState(ts, cs))
          out.result().iterator
      }
  }

  /** Gap-based sessionization with custom state via
    * `flatMapGroupsWithState`: a session closes when `gapMicros` of
    * event-time silence passes within a group's arriving batch, or on
    * processing-time timeout for idle users (`idleTimeoutMs > 0`;
    * pass 0 to disable — a processing-time timeout makes the engine
    * run timeout-check batches forever, which a drain-and-stop test
    * harness can never wait out). */
  def sessionize(events: Dataset[Event], gapMicros: Long,
      idleTimeoutMs: Long = 60000L): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(s =>
              UserSession(userId, s.startMicros, s.endMicros, s.nEvents, s.sumValue))
            state.remove()
            closed.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.eventTimeMicros)
            var cur = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.eventTimeMicros - s.endMicros <= gapMicros =>
                  // a late (out-of-order) event from a later micro-batch
                  // must never move the session end backwards
                  cur = Some(SessionState(
                    math.min(s.startMicros, e.eventTimeMicros),
                    math.max(s.endMicros, e.eventTimeMicros),
                    s.nEvents + 1, s.sumValue + e.value))
                case Some(s) =>
                  closed += UserSession(userId, s.startMicros, s.endMicros,
                    s.nEvents, s.sumValue)
                  cur = Some(SessionState(e.eventTimeMicros, e.eventTimeMicros, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.eventTimeMicros, e.eventTimeMicros, 1L, e.value))
              }
            }
            cur.foreach(state.update)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            closed.result().iterator
          }
      }
  }
}

/** Per-user transition extractor for [[EventStreams.transitionsTws]]:
  * one typed ValueState handle holding the last event seen. */
class TransitionProcessor extends StatefulProcessor[Long, Event, Transition] {

  @transient private var last: ValueState[LastEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[LastEvent]("last",
      org.apache.spark.sql.Encoders.product[LastEvent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[Transition] = {
    val sorted = rows.toSeq.sortBy(e => (e.eventTimeMicros, e.eventId))
    val out = Seq.newBuilder[Transition]
    var prev: Option[LastEvent] = if (last.exists()) Some(last.get()) else None
    sorted.foreach { e =>
      // same stale-arrival drop as the flatMapGroupsWithState path:
      // an event at or below the stored (time, eventId) would invert
      // the transition if treated as newest
      if (!prev.exists(l => e.eventTimeMicros < l.eventTimeMicros ||
          (e.eventTimeMicros == l.eventTimeMicros &&
            e.eventId <= l.eventId))) {
        prev.foreach(l => out += Transition(key, l.eventType, e.eventType))
        prev = Some(LastEvent(e.eventTimeMicros, e.eventId, e.eventType))
      }
    }
    prev.foreach(last.update)
    out.result().iterator
  }
}
