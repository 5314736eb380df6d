package graft.queries

import graft.functions.GraftFunctions
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Gate queries for the time-series join operators Spark lacks
  * natively (SURVEY §2.2 joins: as-of, range/interval) — DuckDB has
  * both built in (`ASOF JOIN`, inequality joins), giving an exact
  * oracle for the Spark-side decompositions in
  * [[graft.operators.AsOfJoin]] / [[graft.operators.RangeJoin]]. */
object JoinQueries {

  private val HalfDayMicros = 12L * 3600 * 1000 * 1000
  private val HourMicros = 3600L * 1000 * 1000

  val defs: Seq[QueryDef] = Seq(

    // As-of: each click joined to the user's latest view at-or-before
    // it. The fixture has no (user_id, ts) duplicates, so the match is
    // unique and the compare exact.
    QueryDef("q45_asof_join",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, event_type FROM events),
        |clicks AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
        |views AS (SELECT event_id AS v_id, user_id, t AS vt FROM e WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id, c.t,
        |       v.v_id AS asof_event_id, v.vt AS asof_t
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.t >= v.vt
        |ORDER BY c.event_id""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val e = ev
        .select(col("event_id"), col("user_id"),
          Tables.tsMicros(ev).as("t"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("t"))
      val views = e.where(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"), col("t").as("vt"))
      AsOfJoin.asOf(clicks, views, key = "user_id",
          leftTime = "t", rightTime = "vt")
        .select(col("event_id"), col("user_id"), col("t"),
          col("asof_v_id").as("asof_event_id"), col("asof_vt").as("asof_t"))
        .orderBy(col("event_id"))
    },

    // Range join without a shared key: per event type, a 12-hour
    // window from its first occurrence; count ALL events falling in
    // each window. Bucket-decomposed equi-join (no nested-loop).
    QueryDef("q46_range_join",
      s"""WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS t FROM events),
         |iv AS (SELECT event_type AS itype, min(t) AS s,
         |              min(t) + $HalfDayMicros AS e_ FROM e GROUP BY event_type)
         |SELECT itype, count(*) AS n_in_window
         |FROM iv JOIN e ON e.t >= iv.s AND e.t < iv.e_
         |GROUP BY itype ORDER BY itype""".stripMargin) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val e = ev
        .select(col("event_id"), col("event_type"), Tables.tsMicros(ev).as("t"))
      val intervals = e.groupBy(col("event_type").as("itype"))
        .agg(min(col("t")).as("s"))
        .withColumn("e_", col("s") + HalfDayMicros)
      RangeJoin.pointInInterval(
          e.select(col("event_id"), col("t")), intervals,
          pointCol = "t", startCol = "s", endCol = "e_",
          bucketWidth = HourMicros)
        .groupBy(col("itype"))
        .agg(count(lit(1)).as("n_in_window"))
        .orderBy(col("itype"))
    },

    // Salted skew join: fan the (skewed) lineitem side over 8 salt
    // subkeys with supplier-side replication; the oracle is the PLAIN
    // join — salting must be invisible in the result.
    QueryDef("q47_salted_join",
      """SELECT s_name,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"), col("l_orderkey"))
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      SkewJoin.saltedInnerJoin(li, sup, key = "suppkey", n = 8,
          saltBy = Seq("l_orderkey"))
        .groupBy(col("s_name"))
        // integer cents: quantity is a 2-decimal double, but x*100 in
        // binary floating point can land just below the integer (0.29
        // * 100 = 28.999...), so round before the long cast — then the
        // sum is exact under any aggregation order
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"))
        .orderBy(col("s_name"))
    },

    // Bloom-prefiltered semi-join: a bloom filter built over the
    // (selective) small side's keys is broadcast and probes the large
    // side BEFORE the exact semi-join — the classic shuffle reducer
    // when the small side is too big to broadcast whole but its key
    // set fits a few KB of bits. The oracle is the PLAIN semi-join:
    // equality proves the bloom admitted every true match (no false
    // negatives), while its false positives were removed by the exact
    // join. Build/probe are the custom BloomAgg / codegen'd
    // BloomMightContain pair.
    QueryDef("q69_bloom_semi_join",
      """SELECT l_returnflag, count(*)::BIGINT AS n_items
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val keys = Tables.load(spark, dir, "supplier")
        .where(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey"))
      val bloomRow = keys.agg(
        GraftFunctions.bloom_agg(col("s_suppkey"), 8192, 5).as("bf"))
      Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_suppkey"))
        .crossJoin(broadcast(bloomRow))
        .where(GraftFunctions.bloom_might_contain(col("bf"), col("l_suppkey"), 5))
        .join(keys, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag"))
    },

    // AUTO-TUNED salted join: q73's key histogram feeds the salt
    // fan-out — each key spreads over ceil(rows/target) subkeys
    // (clamped to [1, 16]) instead of a global constant, so cold keys
    // pay zero replication. The oracle is again the PLAIN join:
    // data-derived salting must be invisible in the result. Summed in
    // integer cents via round(x*100) — extendedprice is genuinely
    // fractional (2-decimal), so the round is what keeps the sum
    // exact under any aggregation order.
    QueryDef("q79_auto_salted_join",
      """SELECT s_name,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"),
          col("l_orderkey"))
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      SkewJoin.autoSaltedInnerJoin(li, sup, key = "suppkey",
          targetRowsPerSalt = 200L, maxFanout = 16,
          saltBy = Seq("l_orderkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
        .orderBy(col("s_name"))
    },

    // Salted join UNDER AQE's skew-join machinery: the same
    // auto-tuned salt as q79, but the final join is pinned to
    // sort-merge (forceShuffle) so it runs through the exact path
    // spark.sql.adaptive.skewJoin inspects — the composition a real
    // cluster runs with both remedies enabled. The oracle is the
    // PLAIN join: salting + AQE's runtime re-planning must be jointly
    // invisible in the result. SkewJoinSpec pins the plan: the
    // adaptive final plan sort-merges on (key, salt) and AQE found no
    // residual skew to split (salting already balanced the
    // partitions).
    QueryDef("q166_salted_join_aqe_skew",
      """SELECT s_name,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"),
          col("l_orderkey"))
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      SkewJoin.autoSaltedInnerJoin(li, sup, key = "suppkey",
          targetRowsPerSalt = 200L, maxFanout = 16,
          saltBy = Seq("l_orderkey"), forceShuffle = true)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"))
        .orderBy(col("s_name"))
    },

    // Key histogram — the skew DIAGNOSIS that precedes q47's salted
    // remedy: the hottest join keys with their row counts and their
    // share of the table in basis points (integer arithmetic). At
    // scale this is the map-side-combined count + TakeOrdered one
    // runs to size a salt fan-out (n ~ hot-key rows / rows-per-task).
    QueryDef("q73_key_histogram",
      """SELECT l_suppkey, count(*)::BIGINT AS n_rows,
        |       (count(*) * 10000 // (SELECT count(*) FROM lineitem)) AS share_bp
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY n_rows DESC, l_suppkey LIMIT 5""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
      val total = li.select(count(lit(1)).as("_total"))
      li.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(total))
        .select(col("l_suppkey"), col("n_rows"),
          expr("n_rows * 10000 DIV _total").as("share_bp"))
        .orderBy(col("n_rows").desc, col("l_suppkey"))
        .limit(5)
    }
  )
}
