package graft.queries

import graft.sources.Tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over `events` — the BATCH equivalents of the
  * [[graft.streaming.EventStreams]] transforms, declared to the
  * correctness gate (streaming queries cannot run under the batch
  * verify harness; these pin the same semantics against the oracle).
  *
  * `events.ts` normalizes to integer epoch MICROS on both sides
  * (Spark via the schema-adaptive [[Tables.tsMicros]], DuckDB via
  * `epoch_us`) so every comparison and bucket boundary is exact
  * integer arithmetic, whichever timestamp representation the
  * fixture generation wrote.
  *
  * Scale: sessionization is one shuffle on user_id (window lag +
  * running sum — Catalyst executes both window functions over a single
  * sort within the partition); windowed stats are a plain partial+
  * final hash agg on (bucket, type). Aggregates emitted are
  * order-independent (counts, min/max) so the oracle hash is stable
  * under any parallelism.
  */
object EventQueries {

  private val GapMicros = 30L * 60 * 1000 * 1000 // 30 min
  private val HourMicros = 3600L * 1000 * 1000
  private val DayMicros = 24L * 3600 * 1000 * 1000
  private val WeekMicros = 7L * 24 * 3600 * 1000 * 1000
  private val FunnelWindowMicros = 7L * 24 * 3600 * 1000 * 1000 // 7 days

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q222 production cap: 64 events/user → ≤2016 slope pairs/user.
    * Above every fixture user's series length, so the shipped gate
    * runs the exact path. */
  private val TsCapK = 64
  /** q235 gate cap: engaged by ~90% of fixture users at every SF. */
  private val TsGateK = 8

  /** (user_id, n_click..n_view) pivot matrix shared by q65/q74. */
  private def pivotCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .count()
      .select(col("user_id") +:
        EventTypes.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"n_$t")): _*)

  val defs: Seq[QueryDef] = Seq(

    // Gap-based sessionization in one pass: new-session flag via lag,
    // session id via running sum, then per-session stats.
    QueryDef("q40_sessionize_batch",
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
         |flags AS (
         |  SELECT user_id, t,
         |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         |                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > $GapMicros
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sess AS (
         |  SELECT user_id, t,
         |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flags)
         |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
         |       min(t) AS start_us, max(t) AS end_us,
         |       count(*) AS n_events
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"))
      val newSession = when(
        lag(col("t"), 1).over(byUser).isNull ||
          col("t") - lag(col("t"), 1).over(byUser) > GapMicros, 1L).otherwise(0L)
      val ev = Tables.load(spark, dir, "events")
      ev.select(col("user_id"), Tables.tsMicros(ev).as("t"))
        .withColumn("new_s", newSession)
        .withColumn("sid", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("t")).as("start_us"), max(col("t")).as("end_us"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sid").as("session_id"),
          col("start_us"), col("end_us"), col("n_events"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // Tumbling 1-hour event-time windows per type (batch twin of
    // EventStreams.windowedStats): epoch-aligned integer buckets.
    QueryDef("q41_windowed_stats",
      s"""SELECT (epoch_us(ts) // $HourMicros) * $HourMicros AS bucket_us,
         |       event_type,
         |       count(*) AS n_events,
         |       max(value) AS max_value
         |FROM events GROUP BY 1, 2
         |ORDER BY bucket_us, event_type""".stripMargin) { (spark, dir) =>
      // end-to-end integer arithmetic: `/` on longs is double division
      val ev = Tables.load(spark, dir, "events")
      ev
        .select(Tables.tsMicros(ev).as("t"), col("event_type"), col("value"))
        .select(expr(s"(t DIV $HourMicros) * $HourMicros").cast("long").as("bucket_us"),
          col("event_type"), col("value"))
        .groupBy(col("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
        .orderBy(col("bucket_us"), col("event_type"))
    },

    // The stream-stream interval join's batch twin: the SAME
    // EventStreams.clickViewJoin column definitions run on batch
    // frames (watermarks no-op in batch), so the oracle pins the exact
    // semantics the streaming spec exercises through MemoryStream.
    // 10 minutes = 600,000,000 micros; timestamps emitted as epoch
    // micros for exact integer compare.
    QueryDef("q61_interval_join_batch",
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
        |c AS (SELECT event_id AS click_id, user_id, t AS ct FROM e WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, t AS vt FROM e WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id, c.ct AS click_t, v.vt AS view_t
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.vt >= c.ct - 600000000 AND v.vt <= c.ct
        |ORDER BY click_id, view_id""".stripMargin) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
      graft.streaming.EventStreams.clickViewJoin(
          e.where(col("event_type") === "click"),
          e.where(col("event_type") === "view"),
          within = "10 minutes")
        .select(col("click_id"), col("user_id"), col("view_id"),
          unix_micros(col("click_time")).as("click_t"),
          unix_micros(col("view_time")).as("view_t"))
        .orderBy(col("click_id"), col("view_id"))
    },

    // Event-time SLIDING window per user: for every event, stats over
    // the preceding 10 minutes via a RANGE frame on epoch micros —
    // value-based framing is tie-order-independent (peers always share
    // a frame), so the gate is exact; the running sum uses integer
    // cents. One shuffle on user_id, one sort, both window functions
    // share the frame.
    QueryDef("q63_sliding_window",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_id, user_id, t,
        |       count(*) OVER w AS n_prec,
        |       CAST(sum(cents) OVER w AS BIGINT) AS sum_cents
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY t
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        .rangeBetween(-600000000L, 0L)
      val ev = Tables.load(spark, dir, "events")
      ev
        .select(col("event_id"), col("user_id"), Tables.tsMicros(ev).as("t"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("user_id"), col("t"),
          count(lit(1)).over(w).as("n_prec"),
          sum(col("cents")).over(w).as("sum_cents"))
        .orderBy(col("event_id"))
    },

    // Spark's NATIVE session_window operator cross-validated against
    // the manual lag/running-sum decomposition the oracle replays —
    // including the boundary rule: an event exactly `gap` after the
    // session's last event starts a NEW session (session end is
    // exclusive), hence `>=` in the oracle's split flag where q40's
    // own definition uses `>`.
    QueryDef("q64_session_window_native",
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
         |flags AS (
         |  SELECT user_id, t,
         |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         |                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= $GapMicros
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sess AS (
         |  SELECT user_id, t,
         |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t
         |                          ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM flags)
         |SELECT user_id, min(t) AS start_us, max(t) + $GapMicros AS end_us,
         |       count(*) AS n_events
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, start_us""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      ev
        .select(col("user_id"),
          timestamp_micros(Tables.tsMicros(ev)).as("event_time"))
        .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us"))
    },

    // Pivot: per-user event-type counts as columns. Spark's pivot
    // with an explicit value list (never value discovery at scale —
    // that is an extra distinct scan); the oracle states the same
    // thing with FILTERed counts.
    QueryDef("q65_pivot_event_counts",
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
        |       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
        |       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
        |       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
        |       count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      pivotCounts(spark, dir).orderBy(col("user_id"))
    },

    // UNPIVOT via stack: q65's wide matrix melted back to
    // (user_id, event_type, n) rows — zero-count combinations
    // included, which is exactly what distinguishes the unpivot from
    // a plain groupBy.
    QueryDef("q74_unpivot",
      s"""SELECT user_id, etype AS event_type, n FROM (
         |${EventTypes.map(t =>
              s"  SELECT user_id, '$t' AS etype, count(*) FILTER (WHERE event_type = '$t')::BIGINT AS n FROM events GROUP BY user_id")
              .mkString("\n  UNION ALL\n")}
         |) t ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
      val stackExpr = EventTypes.map(t => s"'$t', n_$t")
        .mkString(s"stack(${EventTypes.length}, ", ", ", ") as (event_type, n)")
      pivotCounts(spark, dir)
        .selectExpr("user_id", stackExpr)
        .orderBy(col("user_id"), col("event_type"))
    },

    // Ordered 3-stage FUNNEL (signup -> click -> purchase) within a
    // 7-day window of the first signup: the classic behavioral
    // attribution query. Each stage is the MIN event time that is (a)
    // strictly after the previous stage and (b) inside the window —
    // first-touch semantics, integer micros end to end. Scale shape:
    // every stage scan pushes its event_type to parquet
    // (PushedFilters), each stage is one partial+final agg keyed on
    // user_id, and all joins share that same user_id clustering — a
    // funnel over 100 TB of events is three type-pruned scans and one
    // key's worth of exchanges, with AQE absorbing hot-user skew.
    QueryDef("q150_event_funnel",
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         |a AS (SELECT user_id, min(t) AS ta FROM ev
         |      WHERE event_type = 'signup' GROUP BY 1),
         |b AS (SELECT e.user_id, min(e.t) AS tb FROM ev e JOIN a USING (user_id)
         |      WHERE e.event_type = 'click' AND e.t > a.ta
         |        AND e.t <= a.ta + $FunnelWindowMicros
         |      GROUP BY 1),
         |ab AS (SELECT a.user_id, ta, tb FROM a JOIN b USING (user_id)),
         |c AS (SELECT e.user_id, min(e.t) AS tc FROM ev e JOIN ab USING (user_id)
         |      WHERE e.event_type = 'purchase' AND e.t > ab.tb
         |        AND e.t <= ab.ta + $FunnelWindowMicros
         |      GROUP BY 1)
         |SELECT a.user_id, ta, tb, tc
         |FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
         |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val ev0 = Tables.load(spark, dir, "events")
      val ev = ev0
        .select(col("user_id"), col("event_type"), Tables.tsMicros(ev0).as("t"))
      val a = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("t")).as("ta"))
      val b = ev.where(col("event_type") === "click").join(a, "user_id")
        .where(col("t") > col("ta") && col("t") <= col("ta") + FunnelWindowMicros)
        .groupBy(col("user_id")).agg(min(col("t")).as("tb"))
      val ab = a.join(b, "user_id")
      val c = ev.where(col("event_type") === "purchase").join(ab, "user_id")
        .where(col("t") > col("tb") && col("t") <= col("ta") + FunnelWindowMicros)
        .groupBy(col("user_id")).agg(min(col("t")).as("tc"))
      a.join(b, Seq("user_id"), "left").join(c, Seq("user_id"), "left")
        .select(col("user_id"), col("ta"), col("tb"), col("tc"))
        .orderBy(col("user_id"))
    },

    // Two-level COUNT-DISTINCT ROLLUP via sketch merge — the pattern
    // that makes distinct-user dashboards feasible at 100 TB: 6-hour
    // buckets each build an HLL sketch (Spark's DataSketches
    // hll_sketch_agg), and the DAY level is the UNION of its four
    // bucket sketches — never a re-scan of raw events, and the only
    // thing shuffled upward is one fixed-size sketch blob per bucket.
    // The oracle replays the exact distinct counts; the sketch
    // estimate is pinned Spark-side to ±5% of exact at BOTH levels
    // (the q136 hll_ok convention — booleans hash-compare, estimates
    // are engine-specific).
    QueryDef("q153_hll_rollup",
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
         |b AS (SELECT t // ${6 * HourMicros} AS b6, user_id FROM ev),
         |d AS (SELECT b6, (b6 // 4)::BIGINT AS day, user_id FROM b),
         |bx AS (SELECT day, b6, count(DISTINCT user_id)::BIGINT AS n FROM d GROUP BY 1, 2),
         |dx AS (SELECT day, count(DISTINCT user_id)::BIGINT AS n_exact FROM d GROUP BY 1)
         |SELECT day, n_exact,
         |       (SELECT sum(n)::BIGINT FROM bx WHERE bx.day = dx.day) AS bucket_sum,
         |       true AS day_sketch_ok, true AS bucket_sketches_ok
         |FROM dx ORDER BY day""".stripMargin) { (spark, dir) =>
      val ev0 = Tables.load(spark, dir, "events")
      val ev = ev0
        .select(col("user_id"), Tables.tsMicros(ev0).as("t"))
        .select(col("user_id"),
          expr(s"t DIV ${6 * HourMicros}").as("b6")) // integer div: see q40 note
        .withColumn("day", expr("b6 DIV 4"))
      val buckets = ev.groupBy(col("day"), col("b6"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("n"))
      val within5pct = (est: org.apache.spark.sql.Column,
          exact: org.apache.spark.sql.Column) =>
        abs(est - exact) * 20 <= exact
      buckets.groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("day_est"),
          sum(col("n")).as("bucket_sum"),
          max(abs(hll_sketch_estimate(col("sk")) - col("n")) * 20 - col("n"))
            .as("worst_bucket_gap"))
        .join(ev.select(col("day"), col("user_id")).distinct()
          .groupBy(col("day")).agg(count(lit(1)).as("n_exact")), "day")
        .select(col("day"), col("n_exact"), col("bucket_sum"),
          within5pct(col("day_est"), col("n_exact")).as("day_sketch_ok"),
          (col("worst_bucket_gap") <= 0).as("bucket_sketches_ok"))
        .orderBy(col("day"))
    },

    // First-order MARKOV transition model over per-user event
    // sequences (the behavioral-sequence twin of the q168 text LM):
    // transition counts a→b from consecutive events per user
    // (ordered by time, event_id tie-break) and the conditional in
    // exact integer micro-probs, `(n_ab·10⁶) DIV n_a`. One shuffle
    // on user_id for the lag, then a model-frame-sized agg — the
    // same one-corpus-scan shape as the LM build.
    QueryDef("q178_event_markov",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events),
        |nx AS (
        |  SELECT user_id, event_type AS a,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY t, event_id) AS b
        |  FROM e),
        |tc AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM nx
        |       WHERE b IS NOT NULL GROUP BY 1, 2),
        |ta AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM tc GROUP BY 1)
        |SELECT tc.a, tc.b, n_ab, n_a,
        |       (n_ab * 1000000 // n_a)::BIGINT AS p_micro
        |FROM tc JOIN ta USING (a)
        |ORDER BY a, b""".stripMargin) { (spark, dir) =>
      val ev0 = Tables.load(spark, dir, "events")
      val e = ev0.select(col("user_id"), col("event_type"),
        Tables.tsMicros(ev0).as("t"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val tc = e
        .select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"))
        .where(col("b").isNotNull)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      val ta = tc.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
      tc.join(ta, "a")
        .select(col("a"), col("b"), col("n_ab"), col("n_a"),
          expr("(n_ab * 1000000) DIV n_a").as("p_micro"))
        .orderBy(col("a"), col("b"))
    },

    // Time-DECAYED counts with a power-of-two half-life: each event
    // contributes `10⁶ >> age_buckets` micro-units where age_buckets
    // counts 6-hour half-lives back from the corpus max timestamp —
    // halving by bit shift keeps the whole decay EXACT integer
    // arithmetic (a float 2^-x would not replay bit-for-bit across
    // libms), shifts capped at 62 because Java's >> wraps the shift
    // amount mod 64. The recency-weighted popularity every
    // freshness-aware ranking wants; one scalar broadcast (t_max) +
    // one map-side-combined agg.
    QueryDef("q191_decayed_counts",
      s"""WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
         |mx AS (SELECT max(t) AS t_max FROM e),
         |b AS (SELECT event_type,
         |             least((t_max - t) // ${6 * HourMicros}, 62) AS bkt
         |      FROM e CROSS JOIN mx)
         |SELECT event_type, count(*)::BIGINT AS n_events,
         |       sum(1000000 >> bkt)::BIGINT AS decayed_micro
         |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (spark, dir) =>
        val ev0 = Tables.load(spark, dir, "events")
        val e = ev0.select(col("event_type"), Tables.tsMicros(ev0).as("t"))
        val mx = e.agg(max(col("t")).as("t_max"))
        e.crossJoin(broadcast(mx))
          .select(col("event_type"),
            least(expr(s"(t_max - t) DIV ${6 * HourMicros}"), lit(62L))
              .as("bkt"))
          .select(col("event_type"),
            expr("shiftright(1000000L, cast(bkt AS INT))").as("w"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("w")).as("decayed_micro"))
          .orderBy(col("event_type"))
    },

    // Behavioral ANOMALY scoring on the q178 model: each transition
    // costs `round(-ln(n_ab / n_a) · 10⁶)` micro-nats (the LM
    // quantization convention — one IEEE division + one ln, then
    // exact integer sums), users ranked by integer average cost.
    // The model frame is tiny and broadcasts into the per-transition
    // join; the only corpus exchange is the same user_id window q178
    // already pays. The bot/fraud screen an event pipeline runs.
    QueryDef("q188_markov_surprise",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events),
        |nx AS (
        |  SELECT user_id, event_type AS a,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY t, event_id) AS b
        |  FROM e),
        |tr AS (SELECT user_id, a, b FROM nx WHERE b IS NOT NULL),
        |tc AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM tr GROUP BY 1, 2),
        |ta AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM tc GROUP BY 1),
        |costed AS (
        |  SELECT tr.user_id,
        |         CAST(round(-ln(CAST(n_ab AS DOUBLE) / n_a) * 1000000.0) AS BIGINT) AS c
        |  FROM tr JOIN tc USING (a, b) JOIN ta USING (a)),
        |u AS (SELECT user_id, count(*)::BIGINT AS n_trans, sum(c)::BIGINT AS cost_sum
        |      FROM costed GROUP BY 1)
        |SELECT user_id, n_trans, cost_sum,
        |       (cost_sum // n_trans)::BIGINT AS avg_cost_micro
        |FROM u ORDER BY avg_cost_micro DESC, user_id LIMIT 20""".stripMargin) {
      (spark, dir) =>
        val ev0 = Tables.load(spark, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
        val tr = ev0
          .select(col("user_id"), col("event_type").as("a"),
            Tables.tsMicros(ev0).as("t"), col("event_id"))
          .select(col("user_id"), col("a"),
            lead(col("a"), 1).over(w).as("b"))
          .where(col("b").isNotNull)
        val tc = tr.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        val ta = tc.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
        tr.join(broadcast(tc.join(ta, "a")), Seq("a", "b"))
          .select(col("user_id"),
            round(-log(col("n_ab").cast("double") / col("n_a")) * 1000000.0)
              .cast("long").as("c"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_trans"), sum(col("c")).as("cost_sum"))
          .select(col("user_id"), col("n_trans"), col("cost_sum"),
            expr("cost_sum DIV n_trans").as("avg_cost_micro"))
          .orderBy(col("avg_cost_micro").desc, col("user_id"))
          .limit(20)
    },

    // Time-series RESAMPLING with gap filling — the regularization
    // pass every event-time analytics (and feature-engineering)
    // pipeline needs: per-user purchase cents resampled to an hourly
    // grid between the user's first and last observation, missing
    // hours filled by LOCF (last observation carried forward, the
    // SQL-standard `IGNORE NULLS` window form). Scale shape: the
    // spine explode is bounded per user by the OBSERVED span (never a
    // global calendar cross join); spine build, join, and fill window
    // all key on user_id, so the whole operator is one user-keyed
    // exchange lineage. Per-bucket sums in exact integer cents; the
    // output pins every filled value through per-user checksums.
    QueryDef("q201_gap_fill",
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // $HourMicros AS b,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events WHERE event_type = 'purchase'),
         |obs AS (SELECT user_id, b, sum(c)::BIGINT AS cents FROM e GROUP BY 1, 2),
         |spine AS (
         |  SELECT user_id, unnest(range(mn, mx + 1)) AS b
         |  FROM (SELECT user_id, min(b) AS mn, max(b) AS mx FROM obs GROUP BY 1) z),
         |filled AS (
         |  SELECT s.user_id, s.b, o.cents,
         |         last_value(o.cents IGNORE NULLS) OVER (
         |           PARTITION BY s.user_id ORDER BY s.b
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
         |  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.b = o.b)
         |SELECT user_id, count(*)::BIGINT AS n_buckets,
         |       sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_gaps,
         |       sum(f)::BIGINT AS filled_sum
         |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val obs = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), Tables.tsMicros(ev).as("t"),
            round(col("value") * 100).cast("long").as("c"))
          .select(col("user_id"), expr(s"t DIV $HourMicros").as("b"), col("c"))
          .groupBy(col("user_id"), col("b")).agg(sum(col("c")).as("cents"))
        val spine = obs.groupBy(col("user_id"))
          .agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
          .select(col("user_id"),
            explode(sequence(col("mn"), col("mx"))).as("b"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(obs, Seq("user_id", "b"), "left")
          .withColumn("f", last(col("cents"), ignoreNulls = true).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(when(col("cents").isNull, 1L).otherwise(0L)).as("n_gaps"),
            sum(col("f")).as("filled_sum"))
          .orderBy(col("user_id"))
    },

    // TRAILING time-RANGE window frame — the event-TIME sibling of
    // q63's row-count frame: per event, purchase cents and event count
    // over the trailing hour via a RANGE frame on epoch-micros (a
    // NUMERIC range key, schema-adaptive through tsMicros — both
    // engines' RANGE frames are peer-inclusive, so same-timestamp
    // events agree). The burst detector (≥2 events inside an hour) is
    // the fraud/abuse primitive every event pipeline ships. One
    // user-keyed exchange serves both window passes and the final
    // per-user rollup. Exact integer cents throughout.
    QueryDef("q211_trailing_window",
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS t,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events WHERE event_type = 'purchase'),
         |w AS (
         |  SELECT user_id, t, c,
         |         sum(c) OVER (PARTITION BY user_id ORDER BY t
         |           RANGE BETWEEN $HourMicros PRECEDING AND CURRENT ROW) AS s1h,
         |         count(*) OVER (PARTITION BY user_id ORDER BY t
         |           RANGE BETWEEN $HourMicros PRECEDING AND CURRENT ROW) AS n1h
         |  FROM e)
         |SELECT user_id, count(*)::BIGINT AS n_events,
         |       max(s1h)::BIGINT AS max_hour_cents,
         |       sum(CASE WHEN n1h >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_bursty,
         |       sum(s1h)::BIGINT AS s_checksum
         |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), Tables.tsMicros(ev).as("t"),
            round(col("value") * 100).cast("long").as("c"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
          .rangeBetween(-HourMicros, 0)
        e.withColumn("s1h", sum(col("c")).over(w))
          .withColumn("n1h", count(lit(1)).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            max(col("s1h")).as("max_hour_cents"),
            sum(when(col("n1h") >= 2, 1L).otherwise(0L)).as("n_bursty"),
            sum(col("s1h")).as("s_checksum"))
          .orderBy(col("user_id"))
    },

    // RECENCY-weighted user value (the RFM "R×M" score): the last 16
    // purchases weighted by 2^(16−rank) — an order-indexed exponential
    // decay, exact in BIGINT (the time-bucketed sibling is q191).
    // Rank ties beyond (t, cents) cannot change the sum: equal cents
    // swap between adjacent ranks symmetrically. One user-keyed
    // exchange; the rank window and rollup share it.
    QueryDef("q215_recency_score",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, c,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY t DESC, c DESC) AS rn
        |  FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_recent,
        |       CAST(sum(c * (1 << (16 - rn))) AS BIGINT) AS score_scaled
        |FROM r WHERE rn <= 16 GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), Tables.tsMicros(ev).as("t"),
            round(col("value") * 100).cast("long").as("c"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t").desc, col("c").desc)
        e.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 16)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_recent"),
            sum(col("c") * expr("shiftleft(1L, cast(16 - rn AS INT))"))
              .as("score_scaled"))
          .orderBy(col("user_id"))
    },

    // THEIL–SEN robust trend per user — the median of all pairwise
    // slopes (Theil 1950 / Sen 1968), immune to the outliers that
    // wreck least-squares on spend series. Slopes in exact micro-units
    // with the sign SPLIT OUT before division (both engines then
    // divide non-negative operands, where floor ≡ truncate — the same
    // `//` vs `DIV` negative-division trap the DSIR gate documents),
    // median by the disc-lower convention. The pair join is user-keyed
    // (one exchange) and CAPPED: [[graft.operators.TheilSen]] keeps at
    // most [[TsCapK]] events per user by deterministic md5 rank before
    // pairing, bounding per-user fan-out at k·(k−1)/2 no matter how
    // long a power user's series grows — the reference's caller-
    // bounded-state contract (`median.cc:45-48`) applied to the pair
    // join. Below the cap (every fixture user at every SF) the series
    // is untouched and the estimator is EXACT; q235 is the capped-
    // regime twin that provably engages the cap.
    QueryDef("q222_theilsen_trend",
      s"""WITH e0 AS (
         |  SELECT user_id, epoch_us(ts) AS t,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events WHERE event_type = 'purchase'),
         |${graft.operators.TheilSen.oracleSql(TsCapK)}""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), Tables.tsMicros(ev).as("t"),
            round(col("value") * 100).cast("long").as("c"))
        graft.operators.TheilSen.trend(e, TsCapK).orderBy(col("user_id"))
    },

    // Theil–Sen CAPPED-REGIME twin (the q24/q25 bounded-gate
    // convention): same operator, k=[[TsGateK]] — small enough that
    // 90% of fixture users exceed it at every SF, so the md5-rank
    // subsample path is genuinely exercised. Because the cap is
    // deterministic, the gate is a FULL hash compare (stronger than
    // the boolean bounded gates): the oracle replays the rank, the
    // kept multiset, the bounded pair count, and the subsample's
    // median slope exactly.
    QueryDef("q235_theilsen_capped",
      s"""WITH e0 AS (
         |  SELECT user_id, epoch_us(ts) AS t,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events WHERE event_type = 'purchase'),
         |${graft.operators.TheilSen.oracleSql(TsGateK)}""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), Tables.tsMicros(ev).as("t"),
            round(col("value") * 100).cast("long").as("c"))
        graft.operators.TheilSen.trend(e, TsGateK).orderBy(col("user_id"))
    },

    // COHORT retention matrix — the product-analytics staple: users
    // grouped by their FIRST-activity week, counted distinct in each
    // subsequent week offset. Pure integer week buckets (epoch-micros
    // DIV week), so the matrix is hash-exact. Scale: one user-keyed
    // partial+final agg for the cohort week, one user-keyed equi-join
    // back to events (shares the clustering), and the distinct
    // (cohort, offset, user) agg partial-collapses map-side — at
    // 100 TB of events the corpus exchanges on user_id once and on the
    // (cohort, offset, user) triple once, both combiner-friendly.
    QueryDef("q223_cohort_retention",
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // $WeekMicros AS w FROM events),
         |f AS (SELECT user_id, min(w) AS cw FROM e GROUP BY user_id),
         |a AS (
         |  SELECT DISTINCT f.cw AS cw, e.w - f.cw AS k, e.user_id AS user_id
         |  FROM e JOIN f ON e.user_id = f.user_id)
         |SELECT cw AS cohort_week, k AS week_offset, count(*) AS n_users
         |FROM a GROUP BY cw, k
         |ORDER BY cohort_week, week_offset""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val e = ev.select(col("user_id"), Tables.tsMicros(ev).as("t"))
        .select(col("user_id"), expr(s"t DIV ${WeekMicros}L").as("w"))
      val f = e.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      e.join(f, Seq("user_id"))
        .select(col("cw"), (col("w") - col("cw")).as("k"), col("user_id"))
        .distinct()
        .groupBy(col("cw"), col("k"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cw").as("cohort_week"), col("k").as("week_offset"),
          col("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // OFFLINE changepoint detection (binary-segmentation split
    // statistic): over the DAILY purchase series, the day boundary
    // maximizing the scaled |mean(left) − mean(right)| — the "did the
    // metric shift, and when" primitive behind drift alarms. All
    // arithmetic is exact BIGINT with the mean difference compared via
    // cross-multiplication then scaled by ONE shared integer division
    // (both engines truncate non-negative operands identically; the
    // q222 sign discipline). Magnitude bound documented: 1e6 ·
    // |lsum·(n−i) − rsum·i| stays under 2^63 through ~1e10 daily cents
    // over a 100-day series. Scale: the corpus-sized work is the
    // map-side-combined day rollup; every window below it runs over
    // the ≤|days| aggregate frame — driver-tiny by construction, so
    // the unpartitioned windows are not a parallelism hazard.
    QueryDef("q224_changepoint",
      s"""WITH e AS (
         |  SELECT epoch_us(ts) // $DayMicros AS d,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events WHERE event_type = 'purchase'),
         |s AS (SELECT d, CAST(sum(c) AS BIGINT) AS dc FROM e GROUP BY d),
         |p AS (
         |  SELECT d, dc,
         |         sum(dc) OVER (ORDER BY d
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum,
         |         row_number() OVER (ORDER BY d) AS i,
         |         sum(dc) OVER () AS tot,
         |         count(*) OVER () AS n
         |  FROM s),
         |cand AS (
         |  SELECT d, i, n, lsum, tot - lsum AS rsum,
         |         (1000000 * abs(lsum * (n - i) - (tot - lsum) * i))
         |           // (i * (n - i)) AS score
         |  FROM p WHERE i < n)
         |SELECT d AS split_day, CAST(score AS BIGINT) AS score_scaled,
         |       CAST((100 * lsum) // i AS BIGINT) AS left_mean_c100,
         |       CAST((100 * rsum) // (n - i) AS BIGINT) AS right_mean_c100
         |FROM cand ORDER BY score DESC, split_day LIMIT 5""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.where(col("event_type") === "purchase")
          .select(Tables.tsMicros(ev).as("t"),
            round(col("value") * 100).cast("long").as("c"))
          .select(expr(s"t DIV ${DayMicros}L").as("d"), col("c"))
        val s = e.groupBy(col("d")).agg(sum(col("c")).as("dc"))
        val ord = Window.orderBy(col("d"))
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy()
        s.withColumn("lsum", sum(col("dc")).over(run))
          .withColumn("i", row_number().over(ord).cast("long"))
          .withColumn("tot", sum(col("dc")).over(all))
          .withColumn("n", count(lit(1)).over(all))
          .where(col("i") < col("n"))
          .withColumn("score", expr(
            "(1000000L * abs(lsum * (n - i) - (tot - lsum) * i)) DIV (i * (n - i))"))
          .select(col("d").as("split_day"), col("score").as("score_scaled"),
            expr("(100L * lsum) DIV i").as("left_mean_c100"),
            expr("(100L * (tot - lsum)) DIV (n - i)").as("right_mean_c100"))
          .orderBy(col("score_scaled").desc, col("split_day")).limit(5)
    },

    // TIME-weighted average (TWAP) per user: the value integral over
    // the observed span with last-observation-carried-forward — "what
    // was the average level" where the per-event mean over-weights
    // burst periods. Area = Σ v_i·(t_{i+1}−t_i) in exact BIGINT
    // cent-micros, divided once by the span (both engines truncate
    // non-negative operands). Same-timestamp events order by (t, c),
    // so the earlier row contributes zero width — deterministic under
    // ties. One user-keyed exchange serves the lead window and the
    // rollup; single-event users emit NULL (zero span).
    QueryDef("q229_twap",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, t, c,
        |         lead(t) OVER (PARTITION BY user_id ORDER BY t, c) AS nt
        |  FROM e),
        |agg AS (
        |  SELECT user_id, CAST(sum(c * (nt - t)) AS BIGINT) AS area,
        |         max(t) - min(t) AS span, count(*) AS n_events
        |  FROM w GROUP BY user_id)
        |SELECT user_id, n_events,
        |       CASE WHEN span > 0 THEN area // span END AS twap_c,
        |       span AS span_us
        |FROM agg ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val e = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), Tables.tsMicros(ev).as("t"),
          round(col("value") * 100).cast("long").as("c"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("c"))
      e.withColumn("nt", lead(col("t"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(sum(col("c") * (col("nt") - col("t"))).cast("long").as("area"),
          (max(col("t")) - min(col("t"))).as("span"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          when(col("span") > 0, expr("area DIV span")).as("twap_c"),
          col("span").as("span_us"))
        .orderBy(col("user_id"))
    },

    // ROLLING 7-day distinct users (DAU / WAU / stickiness — the
    // engagement dashboard): the sliding window is a 7-OFFSET EXPLODE
    // + equi-agg, never a non-equi range join — each (day, user) row
    // fans out to the ≤7 anchors it can serve, so the plan is map +
    // partial-agg at any scale (the q153 two-level sketch argument,
    // slid). Beside the exact counts, the day-grain HLL sketches
    // union across the same offsets: at 100 TB the exact (anchor,
    // user) distinct is the expensive twin — the dashboard reads the
    // sketch path, whose exchange carries 7 fixed-size blobs per day.
    // Exactness of the sketch estimate is pinned Spark-side (±5%, the
    // q136 boolean convention); everything else replays in DuckDB.
    QueryDef("q234_rolling_distinct",
      s"""WITH ev AS (
         |  SELECT DISTINCT epoch_us(ts) // $DayMicros AS day, user_id
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM ev),
         |dau AS (SELECT day, count(*)::BIGINT AS dau FROM ev GROUP BY day),
         |ex AS (
         |  SELECT DISTINCT ev.day + off AS anchor, user_id
         |  FROM ev CROSS JOIN generate_series(0, 6) g(off)),
         |wau AS (SELECT anchor, count(*)::BIGINT AS wau FROM ex GROUP BY anchor)
         |SELECT d.day AS day, dau.dau AS dau, wau.wau AS wau,
         |       (10000 * dau.dau) // wau.wau AS stickiness_bp,
         |       true AS wau_sketch_ok
         |FROM days d JOIN dau ON d.day = dau.day
         |     JOIN wau ON d.day = wau.anchor
         |ORDER BY day""".stripMargin) { (spark, dir) =>
      val ev0 = Tables.load(spark, dir, "events")
      val ud = ev0
        .select(Tables.tsMicros(ev0).as("t"), col("user_id"))
        .select(expr(s"t DIV ${DayMicros}L").as("day"), col("user_id"))
        .distinct()
      val days = ud.select(col("day")).distinct()
      val dau = ud.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"), hll_sketch_agg(col("user_id")).as("sk"))
      val offs = explode(sequence(lit(0L), lit(6L))).as("off")
      val wauExact = ud.select(offs, col("day"), col("user_id"))
        .select((col("day") + col("off")).as("anchor"), col("user_id"))
        .distinct()
        .groupBy(col("anchor")).agg(count(lit(1)).as("wau"))
      val wauEst = dau.select(offs, col("day"), col("sk"))
        .select((col("day") + col("off")).as("anchor"), col("sk"))
        .groupBy(col("anchor"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      days.join(dau, Seq("day"))
        .join(wauExact.withColumnRenamed("anchor", "day"), Seq("day"))
        .join(wauEst.withColumnRenamed("anchor", "day"), Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          expr("(10000L * dau) DIV wau").as("stickiness_bp"),
          (abs(col("est") - col("wau")) * 20 <= col("wau")).as("wau_sketch_ok"))
        .orderBy(col("day"))
    },

    // Per-user OLS spend trend — the parametric twin of q222's
    // Theil–Sen: slope/intercept from EXACT integer sufficient
    // statistics (x = MINUTES since the user's first purchase — the
    // seconds form's n·Σx² crosses 2^63 near sf10 per-user volumes;
    // minute grain keeps it exact through ~10⁶ events/user·month;
    // y = cents), finals as doubles from
    // one fixed IEEE tree shared verbatim with the oracle. Degenerate
    // fits (single point, zero x-variance) emit NULL through the same
    // CASE in both engines. One user-keyed exchange serves the
    // centering window and the stats rollup.
    QueryDef("q240_group_ols",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 60000000 AS x0,
        |         CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id,
        |         x0 - min(x0) OVER (PARTITION BY user_id) AS x, y
        |  FROM e),
        |s AS (
        |  SELECT user_id, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM c GROUP BY user_id)
        |SELECT user_id, n,
        |       CASE WHEN n * sxx - sx * sx > 0
        |            THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_cpm,
        |       CASE WHEN n * sxx - sx * sx > 0
        |            THEN (CAST(sy AS DOUBLE)
        |                  - (CAST(n * sxy - sx * sy AS DOUBLE)
        |                     / CAST(n * sxx - sx * sx AS DOUBLE))
        |                    * CAST(sx AS DOUBLE)) / n END AS intercept_c
        |FROM s ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val e = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), Tables.tsMicros(ev).as("t"),
          round(col("value") * 100).cast("long").as("y"))
        .select(col("user_id"), expr("t DIV 60000000L").as("x0"), col("y"))
      val wu = Window.partitionBy(col("user_id"))
      e.withColumn("x", col("x0") - min(col("x0")).over(wu))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"))
        .select(col("user_id"), col("n"),
          expr("""CASE WHEN n * sxx - sx * sx > 0
                 |     THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 |          / CAST(n * sxx - sx * sx AS DOUBLE) END"""
            .stripMargin).as("slope_cpm"),
          expr("""CASE WHEN n * sxx - sx * sx > 0
                 |     THEN (CAST(sy AS DOUBLE)
                 |           - (CAST(n * sxy - sx * sy AS DOUBLE)
                 |              / CAST(n * sxx - sx * sx AS DOUBLE))
                 |             * CAST(sx AS DOUBLE)) / n END""".stripMargin)
            .as("intercept_c"))
        .orderBy(col("user_id"))
    },

    // PATH MINING — the top session journeys ("signup → view → click
    // …") product analytics reads next to the q150 fixed funnel: each
    // q40 session's first 5 event types joined into a path string
    // (position-ordered via sort_array of (t, event_id, type) — the
    // event_id tie-break makes same-timestamp paths deterministic),
    // then a plain frequency top-20. One user-keyed exchange serves
    // sessionization AND path assembly; the path census
    // partial-collapses map-side (path strings are bounded — 5 types —
    // so the rollup frame is vocabulary-sized, not corpus-sized).
    QueryDef("q246_path_mining",
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t
         |  FROM events),
         |flags AS (
         |  SELECT user_id, event_id, event_type, t,
         |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
         |                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > $GapMicros
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sess AS (
         |  SELECT user_id, event_id, event_type, t,
         |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flags),
         |ranked AS (
         |  SELECT user_id, sid, event_type,
         |         row_number() OVER (PARTITION BY user_id, sid
         |                            ORDER BY t, event_id) AS rn
         |  FROM sess),
         |paths AS (
         |  SELECT user_id, sid,
         |         string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM ranked WHERE rn <= 5 GROUP BY user_id, sid)
         |SELECT path, count(*) AS n_sessions
         |FROM paths GROUP BY path
         |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.select(col("user_id"), col("event_id"), col("event_type"),
          Tables.tsMicros(ev).as("t"))
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
        val newSession = when(
          lag(col("t"), 1).over(byUser).isNull ||
            col("t") - lag(col("t"), 1).over(byUser) > GapMicros, 1L)
          .otherwise(0L)
        val sess = e.withColumn("new_s", newSession)
          .withColumn("sid", sum(col("new_s")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val bySess = Window.partitionBy(col("user_id"), col("sid"))
          .orderBy(col("t"), col("event_id"))
        sess.withColumn("rn", row_number().over(bySess))
          .where(col("rn") <= 5)
          .groupBy(col("user_id"), col("sid"))
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("rn"), col("event_type")))),
            s => s.getField("event_type")), ">").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path")).limit(20)
    },

    // GINI coefficient + Lorenz curve over per-user purchase totals —
    // the inequality/concentration audit ("do 10% of users drive 90%
    // of spend"): rank users by total, cumulative share at each
    // decile boundary, G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) in exact
    // basis points. The corpus collapses to the per-user frame in one
    // partial-agg'd pass; every window below runs over |users| rows.
    // The `-1` summary row carries the Gini itself.
    QueryDef("q248_gini",
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |r AS (
        |  SELECT user_id, x,
        |         row_number() OVER (ORDER BY x, user_id) AS i,
        |         count(*) OVER () AS n,
        |         CAST(sum(x) OVER () AS BIGINT) AS tx,
        |         CAST(sum(x) OVER (ORDER BY x, user_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cx
        |  FROM u)
        |SELECT CAST(((i - 1) * 10) // n + 1 AS BIGINT) AS decile,
        |       count(*) AS n_users,
        |       CAST(max((10000 * cx) // tx) AS BIGINT) AS cum_share_bp
        |FROM r GROUP BY 1
        |UNION ALL
        |SELECT -1, CAST(max(n) AS BIGINT),
        |       CAST((10000 * (2 * sum(i * x) - (max(n) + 1) * max(tx)))
        |            // (max(n) * max(tx)) AS BIGINT)
        |FROM r
        |ORDER BY decile""".stripMargin) { (spark, dir) =>
      val u = Tables.load(spark, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("x"))
      val ord = Window.orderBy(col("x"), col("user_id"))
      val all = Window.partitionBy()
      val r = u.withColumn("i", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("tx", sum(col("x")).over(all))
        .withColumn("cx", sum(col("x")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val lorenz = r
        .groupBy(expr("((i - 1) * 10) DIV n + 1").as("decile"))
        .agg(count(lit(1)).as("n_users"),
          max(expr("(10000L * cx) DIV tx")).as("cum_share_bp"))
      val gini = r.agg(max(col("n")).as("n"), max(col("tx")).as("tx"),
        sum(col("i") * col("x")).as("six"))
        .select(lit(-1L).as("decile"), col("n").as("n_users"),
          expr("(10000L * (2 * six - (n + 1) * tx)) DIV (n * tx)")
            .as("cum_share_bp"))
      // Deterministic emit order: the -1 summary row sorts first, then
      // the decile rows ascending (the driver compare is row-order
      // sensitive and a hash GROUP BY + UNION ALL guarantees nothing).
      lorenz.unionByName(gini).orderBy(col("decile"))
    },

    // NATIVE session_window sessionization — the built-in Spark
    // session-window API (the same operator Structured Streaming's
    // stateful session aggregation uses) beside q40's explicit
    // lag+running-sum form. Boundary semantics differ from q40 at
    // EXACT gap equality: a session window spans [t, t+gap) and an
    // event landing exactly on the end starts a NEW session, so the
    // oracle's new-session flag is `diff >= gap` (q40's manual form
    // uses `>` — both are valid conventions; each gate pins its own).
    // One shuffle on user_id; the census collapses per user.
    QueryDef("q259_session_window",
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
         |flags AS (
         |  SELECT user_id, t,
         |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         |                OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= $GapMicros
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sess AS (
         |  SELECT user_id,
         |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flags),
         |per AS (SELECT user_id, sid, count(*)::BIGINT AS n_events
         |        FROM sess GROUP BY user_id, sid)
         |SELECT user_id, count(*)::BIGINT AS n_sessions,
         |       CAST(max(n_events) AS BIGINT) AS max_events,
         |       CAST(sum(n_events) AS BIGINT) AS n_events
         |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.select(col("user_id"),
          timestamp_micros(Tables.tsMicros(ev)).as("ts"))
        e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("max_events"),
            sum(col("n_events")).as("n_events"))
          .orderBy(col("user_id"))
    },

    // HLL SET-INTERSECTION estimation by inclusion-exclusion
    // (|A∩B| ≈ est(A) + est(B) − est(A∪B)) — the audience-overlap /
    // cross-slice-cardinality question answered from three sketch
    // blobs instead of a distinct-join of two corpora. Slices: click
    // users with even id vs any-event users with id % 3 = 0 (overlap
    // = id % 6 = 0, a genuine sixth of the population). The q153
    // convention: exact counts come from the oracle, the Spark side
    // emits ±5% accuracy booleans (±10% for the intersection — two
    // sketch errors compound through the subtraction) against its own
    // exact aggregates, the oracle emits literal true. At 100 TB each
    // side is ONE mergeable O(registers) agg and the answer is
    // arithmetic on three sketches — the corpora are never joined.
    QueryDef("q253_hll_intersection",
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'click' AND user_id % 2 = 0),
        |b AS (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0)
        |SELECT (SELECT count(*) FROM a)::BIGINT AS n_a,
        |       (SELECT count(*) FROM b)::BIGINT AS n_b,
        |       (SELECT count(*) FROM a JOIN b USING (user_id))::BIGINT AS n_both,
        |       true AS ok_a, true AS ok_b, true AS ok_both""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val a = ev.where(col("event_type") === "click" &&
          col("user_id") % 2 === 0).select(col("user_id"))
        val b = ev.where(col("user_id") % 3 === 0).select(col("user_id"))
        val sa = a.agg(hll_sketch_agg(col("user_id")).as("ska"),
          countDistinct(col("user_id")).as("n_a"))
        val sb = b.agg(hll_sketch_agg(col("user_id")).as("skb"),
          countDistinct(col("user_id")).as("n_b"))
        val both = a.distinct().join(b.distinct(), Seq("user_id"))
          .agg(count(lit(1)).as("n_both"))
        def ok(est: Column, exact: Column, tolPct: Int): Column =
          abs(est - exact) * 100 <= exact * tolPct
        sa.crossJoin(sb).crossJoin(both)
          .select(col("n_a"), col("n_b"), col("n_both"),
            hll_sketch_estimate(col("ska")).as("ea"),
            hll_sketch_estimate(col("skb")).as("eb"),
            hll_sketch_estimate(hll_union(col("ska"), col("skb"))).as("eu"))
          .select(col("n_a"), col("n_b"), col("n_both"),
            ok(col("ea"), col("n_a"), 5).as("ok_a"),
            ok(col("eb"), col("n_b"), 5).as("ok_b"),
            ok(col("ea") + col("eb") - col("eu"), col("n_both"), 10)
              .as("ok_both"))
    },

    // PER-USER EWMA (exponential smoothing, alpha = 0.3) over the
    // event-time-ordered value stream — the trailing-state feature a
    // monitoring/curation pipeline keeps per entity. Values quantize
    // to exact cents first (the q135 convention), so the only doubles
    // are the fold's own arithmetic: Spark seeds `aggregate` with the
    // first element and folds the rest left-to-right, DuckDB's
    // `list_reduce` does exactly that by definition — identical op
    // order, full hash compare. Scale shape: one exchange on user_id,
    // the per-user sequence is bounded by that user's event count, and
    // EWMA is inherently sequential per entity (a segmented/windowed
    // variant would chunk the list; the fold itself cannot
    // parallelize). The user_id filter prunes at the scan.
    QueryDef("q271_ewma_smooth",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id < 20),
        |seq AS (SELECT user_id,
        |               list(CAST(cents AS DOUBLE) ORDER BY t, event_id) AS l
        |        FROM e GROUP BY user_id)
        |SELECT user_id, CAST(len(l) AS BIGINT) AS n_events,
        |       list_reduce(l, (acc, x) ->
        |         CAST(0.3 AS DOUBLE)*x + CAST(0.7 AS DOUBLE)*acc) AS ewma_cents
        |FROM seq ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val e = ev.where(col("user_id") < 20)
        .select(col("user_id"), Tables.tsMicros(ev).as("t"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      e.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("t"), col("event_id"),
          col("cents").cast("double").as("c")))).as("s"))
        .select(col("user_id"), expr("transform(s, x -> x.c)").as("l"))
        .select(col("user_id"), size(col("l")).cast("long").as("n_events"),
          expr(
            """aggregate(slice(l, 2, size(l) - 1), element_at(l, 1),
              |  (acc, x) -> CAST(0.3 AS DOUBLE)*x + CAST(0.7 AS DOUBLE)*acc)"""
              .stripMargin).as("ewma_cents"))
        .orderBy("user_id")
    },

    // TEMPORAL TRAIN/TEST SPLIT WITH EMBARGO — the time-series
    // leakage-proof split (train strictly before a cutoff, a 1-hour
    // embargo gap DROPPED, test strictly after): the split a pipeline
    // uses when the label horizon would otherwise leak future
    // information across the boundary. Cutoff = the 80% point of the
    // event-time RANGE in exact integer micros (deterministic — no
    // quantile estimation), so every boundary comparison is integer.
    // The output pins the structural guarantee the operator exists
    // for: max(train.t) < cutoff <= cutoff+gap <= min(test.t). Scale
    // shape: one bounds agg (broadcast 1-row) + one map-only filter
    // pass; the split of a 100 TB event log never shuffles it.
    QueryDef("q277_temporal_split",
      s"""WITH e AS (SELECT epoch_us(ts) AS t, user_id FROM events),
         |b AS (SELECT min(t) AS lo, max(t) AS hi FROM e),
         |marks AS (SELECT lo + ((hi - lo) * 8) // 10 AS cutoff,
         |                 lo + ((hi - lo) * 8) // 10 + 3600000000 AS teststart
         |          FROM b),
         |tagged AS (
         |  SELECT CASE WHEN t < cutoff THEN 'a_train'
         |              WHEN t < teststart THEN 'b_embargo'
         |              ELSE 'c_test' END AS split,
         |         t, user_id
         |  FROM e, marks)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |       CAST(min(t) AS BIGINT) AS min_t, CAST(max(t) AS BIGINT) AS max_t
         |FROM tagged GROUP BY split ORDER BY split""".stripMargin) {
      (spark, dir) =>
        val ev = Tables.load(spark, dir, "events")
        val e = ev.select(Tables.tsMicros(ev).as("t"), col("user_id"))
        val marks = broadcast(e.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
          .select(expr("lo + ((hi - lo) * 8) DIV 10").as("cutoff"))
          .withColumn("teststart", col("cutoff") + lit(3600000000L)))
        e.crossJoin(marks)
          .select(when(col("t") < col("cutoff"), "a_train")
            .when(col("t") < col("teststart"), "b_embargo")
            .otherwise("c_test").as("split"), col("t"), col("user_id"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            min(col("t")).as("min_t"), max(col("t")).as("max_t"))
          .orderBy("split")
    },

    // EXACT 1-D WASSERSTEIN (earth-mover) drift between the even- and
    // odd-user event-value distributions — the metric drift monitor
    // PSI (q247) cannot provide: PSI ignores HOW FAR mass moved; W1 =
    // ∫|F0−F1| prices each unit of mass by the distance it travels.
    // Computed EXACTLY on the whole-unit value grid: per-(unit, half)
    // counts (the only corpus-grain pass, map-side combined), one
    // cumulative window over the BOUNDED unit grid (q275 discipline),
    // and the integral as Σ gap·|F0·n1 − F1·n0| — cross-multiplied
    // BIGINTs, no division until the final micro-unit scaling, so the
    // gate is hash-exact. Values shift by +1e9 before the unit DIV so
    // every operand stays nonnegative (Spark DIV truncates toward
    // zero, DuckDB // floors — they agree only above zero).
    QueryDef("q285_wasserstein_drift",
      """WITH e AS (
        |  SELECT user_id % 2 AS half,
        |         (CAST(round(value * 100) AS BIGINT) + 1000000000) // 100 AS v
        |  FROM events),
        |n AS (SELECT CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |      FROM e),
        |g AS (SELECT v,
        |             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM e GROUP BY v),
        |c AS (SELECT v,
        |             CAST(sum(c0) OVER (ORDER BY v) AS BIGINT) AS f0,
        |             CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
        |             lead(v) OVER (ORDER BY v) AS nxt
        |      FROM g)
        |SELECT CAST(count(*) + 1 AS BIGINT) AS grid_cells,
        |       any_value(n0) AS n0, any_value(n1) AS n1,
        |       CAST(sum((nxt - v) * abs(f0 * n1 - f1 * n0)) AS BIGINT) AS w1_scaled,
        |       CAST((1000000 * sum((nxt - v) * abs(f0 * n1 - f1 * n0)))
        |              // (any_value(n0) * any_value(n1)) AS BIGINT) AS w1_micro
        |FROM c CROSS JOIN n WHERE nxt IS NOT NULL""".stripMargin) {
      (spark, dir) =>
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.load(spark, dir, "events")
          .select((col("user_id") % 2).as("half"),
            expr("(CAST(round(value * 100) AS BIGINT) + 1000000000L) DIV 100")
              .as("v"))
        val n = ev.agg(
          sum(when(col("half") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"))
        val g = ev.groupBy(col("v"))
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("c0"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"))
        val w = Window.orderBy(col("v"))
        val c = g.select(col("v"),
          sum(col("c0")).over(w).as("f0"), sum(col("c1")).over(w).as("f1"),
          lead(col("v"), 1).over(w).as("nxt"))
        c.where(col("nxt").isNotNull).crossJoin(broadcast(n))
          .agg((count(lit(1)) + 1).as("grid_cells"),
            first(col("n0")).as("n0"), first(col("n1")).as("n1"),
            sum((col("nxt") - col("v")) *
              abs(col("f0") * col("n1") - col("f1") * col("n0"))).as("w1_scaled"))
          .select(col("grid_cells"), col("n0"), col("n1"), col("w1_scaled"),
            expr("(1000000L * w1_scaled) DIV (n0 * n1)").as("w1_micro"))
    },

    // PEAK CONCURRENCY (interval stabbing maximum) per event type —
    // the capacity-planning sweep line: each event opens an interval
    // [t, t + dur) (dur derived deterministically from value), and the
    // peak is the max of the ±1 boundary running sum. The textbook
    // form is ONE unpartitioned window over the corpus — the exact
    // shape the q237 advice flagged; here it runs as a DISTRIBUTED
    // TWO-PHASE PREFIX SUM instead: intra-bucket running sums under a
    // (type, 6h-bucket)-partitioned window, bucket carry-ins from a
    // window over the BOUNDED bucket grain, peak = max over buckets of
    // (carry + intra max) — algebraically identical to the global
    // sweep (the oracle runs the naive single window; equal results
    // ARE the equivalence proof). Ties at one instant order ends
    // before starts (d ASC), the half-open-interval convention.
    QueryDef("q288_peak_concurrency",
      """WITH iv AS (
        |  SELECT event_type AS et, epoch_us(ts) AS s,
        |         epoch_us(ts) + ((CAST(round(value * 100) AS BIGINT) % 3600) + 60) * 1000000 AS e
        |  FROM events),
        |b AS (SELECT et, s AS t, 1 AS d FROM iv
        |      UNION ALL SELECT et, e, -1 FROM iv),
        |r AS (SELECT et,
        |             CAST(sum(d) OVER (PARTITION BY et ORDER BY t, d
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |      FROM b),
        |p AS (SELECT et, CAST(max(run) AS BIGINT) AS peak FROM r GROUP BY et),
        |n AS (SELECT et, count(*)::BIGINT AS n_intervals FROM iv GROUP BY et)
        |SELECT n.et AS event_type, n.n_intervals, p.peak
        |FROM n JOIN p ON n.et = p.et ORDER BY event_type""".stripMargin) {
      (spark, dir) =>
        import org.apache.spark.sql.expressions.Window
        val BucketUs = 21600L * 1000000L // 6 h
        val evRaw = Tables.load(spark, dir, "events")
        val t = Tables.tsMicros(evRaw)
        val iv = evRaw.select(col("event_type").as("et"), t.as("s"),
          (t + (expr("CAST(round(value * 100) AS BIGINT) % 3600") + 60L) *
            1000000L).as("e"))
        val bounds = iv.select(col("et"), col("s").as("t"), lit(1L).as("d"))
          .unionByName(iv.select(col("et"), col("e").as("t"),
            lit(-1L).as("d")))
          .withColumn("bkt", expr(s"t DIV $BucketUs"))
        val w1 = Window.partitionBy(col("et"), col("bkt"))
          .orderBy(col("t"), col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val intra = bounds.withColumn("run", sum(col("d")).over(w1))
          .groupBy(col("et"), col("bkt")).agg(max(col("run")).as("mx"))
        val w2 = Window.partitionBy(col("et")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = bounds.groupBy(col("et"), col("bkt"))
          .agg(sum(col("d")).as("tot"))
          .withColumn("carry", coalesce(sum(col("tot")).over(w2), lit(0L)))
          .select(col("et"), col("bkt"), col("carry"))
        val peak = intra.join(carry, Seq("et", "bkt"))
          .select(col("et"), (col("mx") + col("carry")).as("pk"))
          .groupBy(col("et")).agg(max(col("pk")).as("peak"))
        iv.groupBy(col("et")).agg(count(lit(1)).as("n_intervals"))
          .join(peak, "et")
          .select(col("et").as("event_type"), col("n_intervals"), col("peak"))
          .orderBy(col("event_type"))
    }
  )
}
