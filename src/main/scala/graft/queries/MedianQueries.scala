package graft.queries

import graft.functions.GraftFunctions
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Queries exercising the reference UDA surface — `appx_median_bounded`,
  * the typed `appx_median_typed`, and the generalized `reservoir_sample`
  * (SURVEY §2.1, §7.1-3/4).
  *
  * Oracle-checked variants run in the exact regime (`max_samples >=
  * group size`, SURVEY §2.1 invariant 4) so results are deterministic:
  * the reservoir never evicts and the answer is exactly the value-sorted
  * element at 0-based index n/2 (upper middle, no interpolation —
  * `median.cc:299-301`). The DuckDB oracle selects that same element
  * explicitly via `row_number`, since DuckDB's `median` interpolates and
  * `quantile_disc` takes the LOWER middle (SURVEY §7.3-3).
  *
  * The exact-regime k is DERIVED from the data (one metadata-fast count
  * per query) rather than hard-coded, so a scale-factor bump can never
  * silently drop these queries into the sampling regime and
  * hash-mismatch; past [[MedianQueries.ExactRegimeCeiling]] they fail
  * loudly instead. The production path at 100 TB is the BOUNDED regime
  * (O(k) state per group, size-weighted merge) gated by the
  * deterministic error-bound queries below (q24/q25) and by tolerance
  * unit tests.
  */
object MedianQueries {

  /** Above this many non-null rows the exact regime is a misuse — the
    * O(n) buffer would no longer be "bounded"; callers must switch to a
    * bounded k. Exact queries fail loudly past it. */
  private val ExactRegimeCeiling = 50 * 1000 * 1000

  /** k for the bounded-regime (production-path) gate query — chosen so
    * the sample-median error sits far inside the gate's 10% bound (see
    * q24's comment) while staying well below the per-group row count. */
  private val GateK = 4096

  /** Memo for [[exactK]]: several exact-regime queries derive k from
    * the same (table, column) — the isNotNull count cannot use parquet
    * footer metadata, so each miss is a real column scan; pay it once
    * per JVM, not once per query. */
  private val exactKMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Smallest k that keeps `df`'s aggregate exact: the non-null count
    * of the sampled column (>= every per-group count). */
  private def exactK(df: DataFrame, c: Column, qname: String): Int = {
    val key = (df.queryExecution.analyzed.semanticHash().toString, c.toString)
    val n = exactKMemo.getOrElseUpdate(key, df.where(c.isNotNull).count())
    require(n <= ExactRegimeCeiling,
      s"$qname: $n rows exceeds the exact-regime ceiling $ExactRegimeCeiling; " +
        "use a bounded k (sampling regime) at this scale")
    math.max(n, 1L).toInt
  }

  private def upperMedianSql(table: String, col: String, out: String,
      partitionBy: Seq[String]): String = {
    val pb = if (partitionBy.isEmpty) "" else s"PARTITION BY ${partitionBy.mkString(", ")}"
    val keep = if (partitionBy.isEmpty) "" else partitionBy.mkString("", ", ", ",")
    val orderBy = if (partitionBy.isEmpty) "" else s" ORDER BY ${partitionBy.mkString(", ")}"
    s"""SELECT $keep $col AS $out FROM (
       |  SELECT $keep $col,
       |         row_number() OVER ($pb ORDER BY $col) AS rn,
       |         count(*) OVER ($pb) AS n
       |  FROM $table WHERE $col IS NOT NULL
       |) t WHERE rn = n // 2 + 1$orderBy""".stripMargin

  }

  val defs: Seq[QueryDef] = Seq(

    // The reference README walkthrough (`README.md:61`) on real data:
    // CAST(appx_median_bounded(x, k) AS DOUBLE), exact regime. The
    // STRING form renders through %g (6 significant digits), so the
    // oracle must model the SAME lossy round trip — comparing against
    // the raw exact median only works when it happens to be
    // 6-digit-representable.
    QueryDef("q13_median_exact",
      s"""SELECT CAST(printf('%g', med) AS DOUBLE) AS med
         |FROM (${upperMedianSql("lineitem", "l_quantity", "med", Seq.empty)}) g
         |""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val li = Tables.load(spark, dir, "lineitem")
      val k = exactK(li, col("l_quantity"), "q13_median_exact")
      li.agg(GraftFunctions.appx_median_bounded(col("l_quantity"), k)
        .cast("double").as("med"))
    },

    // Grouped medians: one reservoir per group key.
    QueryDef("q14_median_by_flag",
      upperMedianSql("lineitem", "l_quantity", "med", Seq("l_returnflag"))) { (spark, dir) =>
      GraftFunctions.register(spark)
      val li = Tables.load(spark, dir, "lineitem")
      val k = exactK(li, col("l_quantity"), "q14_median_by_flag")
      li.groupBy(col("l_returnflag"))
        .agg(GraftFunctions.appx_median_bounded_double(col("l_quantity"), k).as("med"))
        .orderBy(col("l_returnflag"))
    },

    // A second column + group key shape (events.value by event_type),
    // driven through the SQL registration path (2-arg SQL parity).
    // Oracle models the STRING form's %g round trip, as in q13.
    QueryDef("q15_median_events",
      s"""SELECT event_type, CAST(printf('%g', med) AS DOUBLE) AS med
         |FROM (${upperMedianSql("events", "value", "med", Seq("event_type"))}) g
         |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val ev = Tables.load(spark, dir, "events")
      ev.createOrReplaceTempView("events")
      val k = exactK(ev, col("value"), "q15_median_events")
      spark.sql(s"""
        SELECT event_type,
               CAST(appx_median_bounded(value, $k) AS DOUBLE) AS med
        FROM events GROUP BY event_type ORDER BY event_type""")
    },

    // Generalized reservoir, exact regime: every non-null value comes
    // back value-sorted. Declared to the gate as exploded scalar rows
    // (l_returnflag, idx, v) — the driver's pandas compare can't hash
    // array cells — matching the exact-regime invariant of the
    // reference's own test (`median-test.cc:66-79`).
    QueryDef("q16_reservoir_exact",
      """SELECT l_returnflag,
        |       CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) - 1 AS INT) AS idx,
        |       l_quantity AS v
        |FROM lineitem WHERE l_quantity IS NOT NULL
        |ORDER BY l_returnflag, idx""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val li = Tables.load(spark, dir, "lineitem")
      val k = exactK(li, col("l_quantity"), "q16_reservoir_exact")
      li.groupBy(col("l_returnflag"))
        .agg(GraftFunctions.reservoir_sample(col("l_quantity"), k).as("s"))
        .select(col("l_returnflag"), posexplode(col("s")).as(Seq("idx", "v")))
        .orderBy(col("l_returnflag"), col("idx"))
    },

    // STRING-form rendering parity, gated BYTE-FOR-BYTE: the reference
    // formats the median through `stringstream << double` — C %g at
    // the default precision 6 (`median.cc:29-43`) — and the oracle
    // replays that with DuckDB's printf('%g', ...) over the exact
    // upper-median. Values are scaled by 1e6 so the gate crosses the
    // fixed -> scientific switch ("3.53e+07"-style), the formatting
    // case a plain events median would never reach.
    QueryDef("q110_median_string_format",
      """SELECT event_type, printf('%g', med) AS med_str FROM (
        |  SELECT event_type, v AS med FROM (
        |    SELECT event_type, v,
        |           row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |           count(*) OVER (PARTITION BY event_type) AS n
        |    FROM (SELECT event_type, value * 1000000.0 AS v
        |          FROM events WHERE value IS NOT NULL) s
        |  ) t WHERE rn = n // 2 + 1) m ORDER BY event_type""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val ev = Tables.load(spark, dir, "events")
      val k = exactK(ev, col("value"), "q110_median_string_format")
      ev.where(col("value").isNotNull)
        .select(col("event_type"), (col("value") * 1000000.0).as("v"))
        .groupBy(col("event_type"))
        .agg(GraftFunctions.appx_median_bounded(col("v"), k).as("med_str"))
        .orderBy(col("event_type"))
    },

    // Typed median on a TIMESTAMP column — the reference's latent
    // TimestampVal comparator (`median.cc:216-221`) made real.
    QueryDef("q20_median_timestamp",
      upperMedianSql("orders", "o_orderdate", "med", Seq("o_orderpriority"))) { (spark, dir) =>
      GraftFunctions.register(spark)
      val ord = Tables.load(spark, dir, "orders")
      val k = exactK(ord, col("o_orderdate"), "q20_median_timestamp")
      ord.groupBy(col("o_orderpriority"))
        .agg(GraftFunctions.appx_median_typed(col("o_orderdate"), k).as("med"))
        .orderBy(col("o_orderpriority"))
    },

    // Typed median over DECIMAL (ValueOps decimal ordering + codec);
    // result cast back to DOUBLE for a dtype-stable gate compare.
    QueryDef("q38_median_decimal",
      """SELECT CAST(med AS DOUBLE) AS med FROM (
        |  SELECT d AS med FROM (
        |    SELECT CAST(l_quantity AS DECIMAL(12,2)) AS d,
        |           row_number() OVER (ORDER BY CAST(l_quantity AS DECIMAL(12,2))) AS rn,
        |           count(*) OVER () AS n
        |    FROM lineitem WHERE l_quantity IS NOT NULL
        |  ) t WHERE rn = n // 2 + 1) m""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val li = Tables.load(spark, dir, "lineitem")
      val k = exactK(li, col("l_quantity"), "q38_median_decimal")
      li.agg(GraftFunctions.appx_median_typed(
          col("l_quantity").cast("decimal(12,2)"), k).cast("double").as("med"))
    },

    // Typed median over STRING (the reference's memcmp comparator,
    // median.cc:201-208), grouped.
    QueryDef("q39_median_string",
      upperMedianSql("part", "p_brand", "med", Seq("p_type"))) { (spark, dir) =>
      GraftFunctions.register(spark)
      val pt = Tables.load(spark, dir, "part")
      val k = exactK(pt, col("p_brand"), "q39_median_string")
      pt.groupBy(col("p_type"))
        .agg(GraftFunctions.appx_median_typed(col("p_brand"), k).as("med"))
        .orderBy(col("p_type"))
    },

    // ---- Bounded regime (the actual 100 TB production path): O(k)
    // state per group, size-weighted merge. The estimate is randomized
    // (merge order varies with task scheduling), so the gate checks a
    // DETERMINISTIC error-bound boolean instead of the value: the
    // Spark side emits `abs(est - true) * 10 <= true` and the oracle
    // emits literal true. Margin is empirical: 8 repartition-varied
    // trials at sf0.01 put the worst relative error for k=4096 at
    // 2.2%, so the 10% bound sits ~5x above observed worst (~6 sigma
    // for a sample-median of 4096 draws). k stays well below the
    // ~20k-row groups, so the SAMPLING regime is genuinely exercised.
    QueryDef("q24_median_bounded_gate",
      """SELECT l_returnflag, count(l_extendedprice)::BIGINT AS n_rows, true AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(spark, dir, "lineitem")
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val wp = Window.partitionBy(col("l_returnflag"))
      val truth = li.where(col("l_extendedprice").isNotNull)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wp))
        .where(expr("rn = n DIV 2 + 1")) // upper-middle, integer division
        .select(col("l_returnflag"), col("l_extendedprice").as("tru"))
      li.groupBy(col("l_returnflag"))
        .agg(GraftFunctions.appx_median_bounded_double(
            col("l_extendedprice"), GateK).as("est"),
          count(col("l_extendedprice")).as("n_rows"))
        .join(truth, "l_returnflag")
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("est") - col("tru")) * 10 <= col("tru")).as("ok"))
        .orderBy(col("l_returnflag"))
    },

    // Bounded reservoir: sample CONTENTS are randomized but the
    // sample's structure is not — per group the size is exactly
    // least(k, n), the finalize order is value-sorted, and every
    // element lies within the group's [min, max]. All four facts are
    // emitted as one deterministic boolean.
    QueryDef("q25_reservoir_bounded_gate",
      """SELECT l_suppkey, least(64, count(l_quantity))::BIGINT AS n_sampled, true AS ok
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(GraftFunctions.reservoir_sample(col("l_quantity"), 64).as("s"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
          count(col("l_quantity")).as("n"))
        .select(col("l_suppkey"),
          size(col("s")).cast("long").as("n_sampled"),
          (size(col("s")).cast("long") === least(lit(64L), col("n")) &&
            col("s") === sort_array(col("s")) &&
            array_min(col("s")) >= col("mn") &&
            array_max(col("s")) <= col("mx")).as("ok"))
        .orderBy(col("l_suppkey"))
    },

    // Typed quantile (p90), exact regime: the generalized finalize's
    // index floor(0.9 * n) replayed by the oracle window (both engines
    // compute the identical 0.9 * n double from the same integer n).
    QueryDef("q56_quantile_typed",
      """SELECT l_returnflag, p90 FROM (
        |  SELECT l_returnflag, l_extendedprice AS p90,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL) t
        |WHERE rn = CAST(floor(0.9 * n) AS BIGINT) + 1
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      val li = Tables.load(spark, dir, "lineitem")
      val k = exactK(li, col("l_extendedprice"), "q56_quantile_typed")
      li.groupBy(col("l_returnflag"))
        .agg(GraftFunctions.appx_quantile_typed(
          col("l_extendedprice"), 0.9, k).as("p90"))
        .orderBy(col("l_returnflag"))
    },

    // Bounded-heap top-k per group (max_k): O(k) state + map-side
    // combine instead of the window sort of every row. Exploded to
    // scalar rows for the gate, like q16.
    QueryDef("q37_topk_per_group",
      """SELECT l_returnflag, CAST(rn - 1 AS INT) AS idx, v FROM (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY l_extendedprice DESC) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL) t
        |WHERE rn <= 5 ORDER BY l_returnflag, idx""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(GraftFunctions.max_k(col("l_extendedprice"), 5).as("s"))
        .select(col("l_returnflag"), posexplode(col("s")).as(Seq("idx", "v")))
        .orderBy(col("l_returnflag"), col("idx"))
    },

    // Bounded-regime QUANTILE gate, q24's shape at p90: the sampled
    // p90's rank error (sd ~ sqrt(0.9*0.1/4096) ~ 0.47% of n) sits an
    // order of magnitude inside the 10% value bound.
    QueryDef("q62_quantile_bounded_gate",
      """SELECT l_returnflag, count(l_extendedprice)::BIGINT AS n_rows, true AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(spark, dir, "lineitem")
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val wp = Window.partitionBy(col("l_returnflag"))
      val truth = li.where(col("l_extendedprice").isNotNull)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wp))
        .where(expr("rn = CAST(floor(0.9 * n) AS BIGINT) + 1"))
        .select(col("l_returnflag"), col("l_extendedprice").as("tru"))
      li.groupBy(col("l_returnflag"))
        .agg(GraftFunctions.appx_quantile_typed(
            col("l_extendedprice"), 0.9, GateK).as("est"),
          count(col("l_extendedprice")).as("n_rows"))
        .join(truth, "l_returnflag")
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("est") - col("tru")) * 10 <= col("tru")).as("ok"))
        .orderBy(col("l_returnflag"))
    },

    // The reference UDA as a WINDOW function: running median per
    // event type over an ever-growing ROWS frame — the reservoir
    // aggregate plugs into Spark's object window frames unchanged.
    // The event_id < 2000 slice keeps every partition inside the
    // exact regime (k = 2048 >= any prefix), so each row's value is
    // the deterministic upper-middle of its prefix, which the oracle
    // replays with a sorted list() window aggregate.
    QueryDef("q77_running_median",
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS t, value
        |           FROM events WHERE event_id < 2000)
        |SELECT event_id, event_type,
        |       (list_sort(list(value) OVER w))[(count(*) OVER w) // 2 + 1] AS run_med
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables.load(spark, dir, "events")
      ev
        .where(col("event_id") < 2000)
        .select(col("event_id"), col("event_type"),
          Tables.tsMicros(ev).as("t"), col("value"))
        .select(col("event_id"), col("event_type"),
          GraftFunctions.appx_median_bounded_double(col("value"), 2048)
            .over(w).as("run_med"))
        .orderBy(col("event_id"))
    },

    // min_k, the ascending mirror — same O(k) heap, same gate shape.
    QueryDef("q57_bottomk_per_group",
      """SELECT l_returnflag, CAST(rn - 1 AS INT) AS idx, v FROM (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY l_extendedprice) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL) t
        |WHERE rn <= 5 ORDER BY l_returnflag, idx""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(GraftFunctions.min_k(col("l_extendedprice"), 5).as("s"))
        .select(col("l_returnflag"), posexplode(col("s")).as(Seq("idx", "v")))
        .orderBy(col("l_returnflag"), col("idx"))
    }
  )
}
