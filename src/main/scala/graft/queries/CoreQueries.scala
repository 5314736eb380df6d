package graft.queries

import graft.sources.Tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: the host-engine capabilities the reference assumes
  * from Impala (SURVEY §2.2 — scan/filter/project, joins incl.
  * semi/anti, hash aggregation, windows, sort/limit, set ops, rollup,
  * scalar functions), expressed declaratively so Catalyst supplies
  * pushdown, pruning, partial aggregation and join planning.
  *
  * Determinism rules for oracle parity (driver hash-compares against
  * DuckDB): every query ends in a total ORDER BY; double SUMs are
  * either over integral-valued doubles (order-independent) or routed
  * through DECIMAL casts (exact, associative); no libm functions whose
  * last-ulp behavior differs across engines (pow/ln/exp avoided).
  */
object CoreQueries {

  private val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-shaped pricing summary: partial+final hash aggregation.
    QueryDef("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order,
        |  sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(disc.cast("decimal(20,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Filter + projection — predicate and column pruning reach the
    // parquet scan (verified via explain in the spec).
    QueryDef("q02_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp")
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), disc.as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Multi-way join: fact-fact shuffle join + broadcast dim join.
    QueryDef("q03_join_revenue_nation",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      val ord = Tables.load(spark, dir, "orders")
      val li = Tables.load(spark, dir, "lineitem")
      val nat = Tables.load(spark, dir, "nation")
      cust
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(disc.cast("decimal(20,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    },

    // Left-semi join (EXISTS).
    QueryDef("q04_semi_join",
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      val ord = Tables.load(spark, dir, "orders")
      cust.join(ord.filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    },

    // Left-anti join (NOT EXISTS).
    QueryDef("q05_anti_join",
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
      val part = Tables.load(spark, dir, "part")
      val li = Tables.load(spark, dir, "lineitem")
      part.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("p_brand"))
    },

    // Window function: per-partition top-1 with full tiebreak.
    QueryDef("q06_window_top_supplier",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem) t
        |WHERE rn = 1
        |ORDER BY l_suppkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.load(spark, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_suppkey"))
    },

    // Top-k: ORDER BY + LIMIT (Spark plans TakeOrderedAndProject — no
    // global sort at scale).
    QueryDef("q07_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)
    },

    // Set operations: INTERSECT then EXCEPT (distinct semantics).
    QueryDef("q08_set_ops",
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |) t ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      val ord = Tables.load(spark, dir, "orders")
      def byStatus(s: String) =
        ord.filter(col("o_orderstatus") === s).select(col("o_custkey"))
      byStatus("O").intersect(byStatus("F")).except(byStatus("P"))
        .orderBy(col("o_custkey"))
    },

    // ROLLUP grouping sets (nulls coalesced so both engines agree on
    // ordering and hashing of the subtotal rows).
    QueryDef("q09_rollup",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(l_linestatus, 'ALL') AS lstatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // CUBE: all 2^2 grouping combinations (rollup's sibling; Catalyst
    // expands both into a single Expand + hash agg — one shuffle).
    QueryDef("q33_cube",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(l_linestatus, 'ALL') AS lstatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // Explicit GROUPING SETS through the SQL surface (no 'ALL' row:
    // the chosen sets are the two single-key groupings).
    QueryDef("q34_grouping_sets",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |       COALESCE(l_linestatus, 'ALL') AS lstatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rflag, lstatus""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
      spark.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
          |       COALESCE(l_linestatus, 'ALL') AS lstatus,
          |       sum(l_quantity) AS sum_qty, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY rflag, lstatus""".stripMargin)
    },

    // Scalar string functions.
    QueryDef("q10_scalar_string",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  length(p_name) AS name_len,
        |  substr(p_type, 1, 5) AS type5,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS name_u
        |FROM part ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          replace(col("p_name"), lit(" "), lit("_")).as("name_u"))
        .orderBy(col("p_partkey"))
    },

    // Scalar date/time functions (UTC session; INT-cast for type parity).
    QueryDef("q11_scalar_datetime",
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY yr, mo
        |ORDER BY yr, mo""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("yr"), col("mo"))
    },

    // Scalar math functions (only ops with engine-identical IEEE
    // behavior: sqrt, abs, floor/ceil, modulo).
    QueryDef("q12_scalar_math",
      """SELECT l_orderkey, l_linenumber,
        |  sqrt(l_quantity) AS sq,
        |  abs(l_extendedprice - 1000.0 * l_quantity) AS ab,
        |  CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_pct,
        |  CAST(ceil(l_tax * 100.0) AS BIGINT) AS tax_pct,
        |  l_orderkey % 7 AS bucket
        |FROM lineitem
        |WHERE l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_quantity")).as("sq"),
          abs(col("l_extendedprice") - lit(1000.0) * col("l_quantity")).as("ab"),
          floor(col("l_discount") * lit(100.0)).as("disc_pct"),
          ceil(col("l_tax") * lit(100.0)).as("tax_pct"),
          (col("l_orderkey") % 7).as("bucket"))
        .orderBy(col("l_orderkey"))
    },

    // Distribution window functions: ntile / percent_rank / cume_dist.
    // The ordering key (o_totalprice, o_orderkey) is UNIQUE, so every
    // rank is tie-free and percent_rank's (rank-1)/(n-1) divides the
    // same integers in both engines — bit-exact doubles. A single
    // global window is fine for a gate; a production distribution pass
    // partitions first (as q06 does) so each window sorts one group.
    QueryDef("q66_window_distribution",
      """SELECT o_orderkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderkey"))
    },

    // FULL OUTER join (the one join type q03-q05/q45 left ungated):
    // unmatched rows from BOTH sides survive with nulls, counted on
    // each side of the seam.
    QueryDef("q70_full_outer_join",
      """WITH j AS (
        |  SELECT c.c_custkey, o.o_orderkey
        |  FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey)
        |SELECT count(*)::BIGINT AS n_rows,
        |       count(*) FILTER (WHERE o_orderkey IS NULL)::BIGINT AS customers_no_orders,
        |       count(*) FILTER (WHERE c_custkey IS NULL)::BIGINT AS orphan_orders
        |FROM j""".stripMargin) { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer").select(col("c_custkey"))
      val o = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("o_orderkey").isNull, 1)).as("customers_no_orders"),
          count(when(col("c_custkey").isNull, 1)).as("orphan_orders"))
    },

    // JSON scalar functions: both engines build the IDENTICAL json
    // text by string concat, then each parses it back with its own
    // extractor (get_json_object vs json_extract_string) — the gate
    // checks the parse, not the formatting.
    QueryDef("q71_json_funcs",
      """WITH js AS (
        |  SELECT n_nationkey,
        |         '{"k":' || n_nationkey || ',"name":"' || n_name || '"}' AS j
        |  FROM nation)
        |SELECT n_nationkey,
        |       json_extract_string(j, '$.name') AS name_out,
        |       json_extract(j, '$.k')::BIGINT AS k_out
        |FROM js ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"),
          concat(lit("{\"k\":"), col("n_nationkey"),
            lit(",\"name\":\""), col("n_name"), lit("\"}")).as("j"))
        .select(col("n_nationkey"),
          get_json_object(col("j"), "$.name").as("name_out"),
          get_json_object(col("j"), "$.k").cast("long").as("k_out"))
        .orderBy(col("n_nationkey"))
    },

    // Spark 4 VARIANT end-to-end: semi-structured event props parsed
    // ONCE into the binary variant encoding (`parse_json`), fields
    // extracted with `variant_get` typed paths, then aggregated — the
    // modern ingestion shape for schema-on-read event payloads (parse
    // at the scan, extract many times without re-parsing text). The
    // oracle reads the same JSON with DuckDB's extract; all compared
    // values are integers.
    QueryDef("q184_variant_props",
      """SELECT event_type, count(*)::BIGINT AS n,
        |       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_sum,
        |       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (spark, dir) =>
        Tables.load(spark, dir, "events")
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
            max(col("k")).as("k_max"))
          .orderBy(col("event_type"))
    },

    // Boolean aggregates (every/any) + a FILTERed count: comparisons
    // of identical doubles are engine-identical, so the booleans are
    // exact.
    QueryDef("q75_bool_aggs",
      """SELECT l_returnflag,
        |       bool_and(l_quantity > 0) AS all_pos,
        |       bool_or(l_discount > 0.05) AS any_disc,
        |       count(*) FILTER (WHERE l_tax = 0)::BIGINT AS n_notax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("bool_and(l_quantity > 0)").as("all_pos"),
          expr("bool_or(l_discount > 0.05)").as("any_disc"),
          count(when(col("l_tax") === 0, 1)).as("n_notax"))
        .orderBy(col("l_returnflag"))
    },

    // Ordered string aggregation: Spark expresses DuckDB's
    // string_agg(x, ',' ORDER BY x) as sort_array(collect_list) +
    // array_join — the sort makes the nondeterministic collect order
    // irrelevant.
    QueryDef("q76_string_agg",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
        .orderBy(col("n_regionkey"))
    },

    // ---- SQL subquery surface (q82-q84): the reference's users write
    // SQL through the host engine (README.md:51-61), so these three
    // gates drive spark.sql DIRECTLY with the IDENTICAL ANSI text the
    // oracle runs — one string, two engines, hash-equal results.
    // Catalyst decorrelates/rewrites them into the join shapes gated
    // elsewhere (scalar subquery -> agg+join, NOT EXISTS -> anti join,
    // IN -> semi join), which .explain confirms — no nested-loop
    // per-row execution.

    // Correlated scalar subquery with an aggregate: each customer's
    // most expensive order (max is order-independent -> exact).
    QueryDef.sqlSurface("q82_sql_correlated_scalar",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin, Seq("orders")),

    // NOT EXISTS (anti-join form): customers with no order beyond the
    // threshold.
    QueryDef.sqlSurface("q83_sql_not_exists",
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin, Seq("customer", "orders")),

    // IN subquery (semi-join form) against a filtered column set.
    QueryDef.sqlSurface("q84_sql_in_subquery",
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
        |                    WHERE l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin, Seq("part", "lineitem")),

    // ---- Whole TPC-H-shaped analytic SQL (q85-q86): the full
    // multi-join queries a reference user migrates, as ONE shared ANSI
    // string. Revenue sums route through DECIMAL(20,4) (exact,
    // associative — q01's idiom) so the double result is engine-
    // identical; ORDER BY carries a full tie-break. Dates adapted to
    // the fixture's 1995-2001 span.

    // TPC-H Q3 shape — shipping priority: 3-way join, filtered both
    // sides of the date, grouped revenue, top 10.
    QueryDef.sqlSurface("q85_sql_tpch_q3",
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
        |       CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
        |            + day(o_orderdate) AS BIGINT) AS o_date_key,
        |       o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_date_key, l_orderkey
        |LIMIT 10""".stripMargin, Seq("customer", "orders", "lineitem")),

    // TPC-H Q5 shape — local supplier volume: 6-way join through
    // customer/orders/lineitem/supplier/nation/region with the
    // same-nation constraint, one year of orders, revenue per nation.
    QueryDef.sqlSurface("q86_sql_tpch_q5",
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")),

    // Planner-level approximation opt-in: the SAME SQL text
    // (`count(DISTINCT fp)`) a BI tool emits runs exact by default
    // and becomes an HLL++ estimate under
    // spark.graft.approxDistinct.enabled — dashboards written for a
    // small warehouse scale to 100 TB without editing query text,
    // because the upward exchange carries a fixed-size HLL buffer per
    // group instead of every distinct value. The gate compares the
    // rewritten estimate against the exact distinct (computed via a
    // distinct→count shape the rule does not touch) and emits the
    // q136-convention tolerance boolean; ApproxDistinctRuleSpec pins
    // the rewrite itself, plan shape, and scope restoration.
    QueryDef("q160_approx_count_rewrite",
      """SELECT lang, true AS sketch_ok FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      graft.plans.ApproxDistinctRule.scoped(spark) {
        val docs = Tables.load(spark, dir, "documents")
          .select(col("lang"), md5(col("text")).as("fp"))
        docs.createOrReplaceTempView("q160_docs")
        val est = spark.sql(
          "SELECT lang, count(DISTINCT fp) AS n_est FROM q160_docs GROUP BY lang")
        val exact = docs.distinct()
          .groupBy(col("lang")).agg(count(lit(1)).as("n_exact"))
        val out = est.join(exact, "lang")
          .select(col("lang"),
            (abs(col("n_est") - col("n_exact")) * 20 <= col("n_exact"))
              .as("sketch_ok"))
          .orderBy(col("lang"))
        out.queryExecution.executedPlan // bake the rewritten plan in-scope
        out
      }
    },

    // WITH RECURSIVE through Spark 4's new recursive-CTE support —
    // ONE ANSI text, two engines: an 11-row price-bucket spine
    // generated by the recursion drives a non-equi histogram join
    // (the tiny spine broadcasts against the fact scan; recursion
    // depth is planning-scale, data never loops).
    QueryDef.sqlSurface("q161_sql_recursive_cte",
      """WITH RECURSIVE buckets(lo) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT lo + 50000 FROM buckets WHERE lo < 500000
        |)
        |SELECT CAST(lo AS BIGINT) AS lo,
        |       count(o_orderkey) AS n_orders,
        |       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS cents
        |FROM buckets LEFT JOIN orders
        |  ON o_totalprice >= lo AND o_totalprice < lo + 50000
        |GROUP BY lo ORDER BY lo""".stripMargin, Seq("orders")),

    // LATERAL correlated subquery with per-group ORDER BY + LIMIT —
    // the SQL spelling of top-k-per-group (q37's DataFrame shape);
    // Catalyst decorrelates it to a ranked join, never a per-row
    // nested loop.
    QueryDef.sqlSurface("q162_sql_lateral",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
      Seq("customer", "orders")),

    // PIVOT → UNPIVOT round trip — the relational-reshaping SQL
    // surface a migrating warehouse user expects. Spark's PIVOT/
    // UNPIVOT clauses reshape (source, lang) sums into a wide 5-lang
    // matrix and back; UNPIVOT's default EXCLUDE NULLS drops the
    // (source, lang) combos absent from the fixture, so the oracle is
    // the PLAIN group-by — the reshape must be lossless and
    // invisible. (Not a sqlSurface gate: DuckDB's PIVOT grammar
    // differs, which is exactly why the oracle pins the semantics
    // through the round trip.)
    QueryDef("q200_pivot_roundtrip",
      """SELECT source, lang, sum(n_chars)::BIGINT AS nc
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
      spark.sql(
        """SELECT source, lang, nc FROM (
          |  SELECT * FROM (SELECT source, lang, n_chars FROM documents)
          |  PIVOT (sum(n_chars) FOR lang IN
          |    ('de' AS de, 'en' AS en, 'es' AS es, 'fr' AS fr, 'zh' AS zh))
          |) UNPIVOT (nc FOR lang IN (de, en, es, fr, zh))
          |ORDER BY source, lang""".stripMargin)
    },

    // Per-group WINSORIZATION — the outlier-clipping feature transform
    // (clip each value into the group's exact [p05, p95]): thresholds
    // by the disc-lower convention (ascending index floor((n-1)·p)+1 —
    // value-at-index is well-defined under ties because equal values
    // are adjacent), applied via a 3-row broadcast join, sums in exact
    // integer cents. ONE ANSI string both engines run verbatim; the
    // only corpus exchanges are the per-group rank window and the
    // final aggregation.
    QueryDef.sqlSurface("q207_winsorize",
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |r AS (
        |  SELECT flag, cents,
        |         row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
        |         count(*) OVER (PARTITION BY flag) AS n
        |  FROM c),
        |t AS (
        |  SELECT flag,
        |         max(CASE WHEN rn = CAST(floor((n - 1) * 5 / 100) AS BIGINT) + 1
        |                  THEN cents END) AS lo,
        |         max(CASE WHEN rn = CAST(floor((n - 1) * 95 / 100) AS BIGINT) + 1
        |                  THEN cents END) AS hi
        |  FROM r GROUP BY flag),
        |w AS (
        |  SELECT c.flag AS flag,
        |         CASE WHEN cents < lo THEN lo
        |              WHEN cents > hi THEN hi ELSE cents END AS wc,
        |         CASE WHEN cents < lo THEN 1 ELSE 0 END AS cl,
        |         CASE WHEN cents > hi THEN 1 ELSE 0 END AS ch
        |  FROM c JOIN t ON c.flag = t.flag)
        |SELECT flag, count(*) AS n_rows,
        |       CAST(sum(cl) AS BIGINT) AS n_clip_lo,
        |       CAST(sum(ch) AS BIGINT) AS n_clip_hi,
        |       CAST(sum(wc) AS BIGINT) AS winsor_sum
        |FROM w GROUP BY flag ORDER BY flag""".stripMargin,
      Seq("lineitem")),

    // EQUI-DEPTH binning (`ntile`) — the feature-engineering
    // discretization equal-WIDTH histograms (q73) can't give on skewed
    // values: every bin holds the same row count, bin edges follow the
    // data. Deterministic under ties via the full (value, orderkey,
    // linenumber) sort; both engines share ntile's n/k+remainder
    // bucket-size rule. ONE ANSI string.
    QueryDef.sqlSurface("q212_equidepth_bins",
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         l_orderkey, l_linenumber
        |  FROM lineitem),
        |b AS (
        |  SELECT flag, cents,
        |         CAST(ntile(8) OVER (PARTITION BY flag
        |           ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS bin
        |  FROM c)
        |SELECT flag, bin, count(*) AS n_rows,
        |       min(cents) AS lo, max(cents) AS hi,
        |       CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM b GROUP BY flag, bin ORDER BY flag, bin""".stripMargin,
      Seq("lineitem")),

    // Correlation/covariance by EXACT integer sums — the cross-engine-
    // deterministic form of `corr`: native corr() accumulates doubles
    // in partition order (not hash-comparable across engines), so the
    // five sufficient statistics are exact BIGINTs (price in whole
    // dollars keeps Σp² < 2^63 far past 100× fixture scale) and the
    // double derivation at the end is ONE fixed expression tree —
    // identical inputs, identical IEEE result. The map-side-combined
    // integer partials are also exactly how a distributed corr should
    // shuffle: 6 longs per group, never raw rows.
    QueryDef.sqlSurface("q213_corr_exact",
      """WITH c AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
        |         CAST(round(l_extendedprice) AS BIGINT) AS p
        |  FROM lineitem),
        |s AS (
        |  SELECT flag, count(*) AS n,
        |         CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
        |         CAST(sum(q * q) AS BIGINT) AS sqq,
        |         CAST(sum(p * p) AS BIGINT) AS spp,
        |         CAST(sum(q * p) AS BIGINT) AS sqp
        |  FROM c GROUP BY flag)
        |SELECT flag, n, sqp,
        |       ((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)) - (CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)))
        |       / (sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)) - (CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)))
        |          * sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)) - (CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))))
        |         AS corr_qp
        |FROM s ORDER BY flag""".stripMargin,
      Seq("lineitem")),

    // INTERSECT ALL / EXCEPT ALL — the MULTISET set ops q08's
    // DISTINCT forms don't cover (bag semantics: min / difference of
    // multiplicities). except_all leaves cnt−1 copies per repeat
    // customer; intersect_all keeps min(total, open) per key.
    QueryDef.sqlSurface("q214_set_ops_all",
      """WITH x AS (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey FROM customer),
        |y AS (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'except_all' AS op, count(*) AS n_rows,
        |       CAST(sum(k) AS BIGINT) AS key_sum,
        |       CAST(count(DISTINCT k) AS BIGINT) AS n_keys
        |FROM x
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS n_rows,
        |       CAST(sum(k) AS BIGINT) AS key_sum,
        |       CAST(count(DISTINCT k) AS BIGINT) AS n_keys
        |FROM y
        |ORDER BY op""".stripMargin,
      Seq("orders", "customer")),

    // ROBUST outlier detection via MAD (Hampel's median absolute
    // deviation — the reference's median family composed into the
    // quality rule mean/stddev can't give on heavy tails): exact
    // per-group median (disc lower-middle, the reference's upper/lower
    // convention made ANSI-portable), exact median of |v − med|, flag
    // |v − med| > 3·MAD — all BIGINT cents, zero float drift. Two rank
    // windows + two broadcast-size threshold joins; the corpus
    // exchanges only on the group key. SCALE ROUTING: exactness here
    // costs two full-corpus sort windows partitioned by a LOW-
    // CARDINALITY key (parallelism caps at the group count — measured
    // 7.7× for 10× data); at 100 TB ask the same question through the
    // mergeable sketch/reservoir median family (q112/q113 quantile
    // sketch, appx_median) and keep this gate as the exactness pin.
    QueryDef.sqlSurface("q216_mad_outliers",
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |         l_orderkey, l_linenumber
        |  FROM lineitem),
        |r AS (
        |  SELECT flag, v,
        |         row_number() OVER (PARTITION BY flag
        |           ORDER BY v, l_orderkey, l_linenumber) AS rn,
        |         count(*) OVER (PARTITION BY flag) AS n
        |  FROM c),
        |med AS (
        |  SELECT flag, max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
        |                   THEN v END) AS med
        |  FROM r GROUP BY flag),
        |d AS (
        |  SELECT c.flag AS flag, abs(v - med) AS av
        |  FROM c JOIN med ON c.flag = med.flag),
        |r2 AS (
        |  SELECT flag, av,
        |         row_number() OVER (PARTITION BY flag ORDER BY av) AS rn,
        |         count(*) OVER (PARTITION BY flag) AS n
        |  FROM d),
        |mad AS (
        |  SELECT flag, max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
        |                   THEN av END) AS mad
        |  FROM r2 GROUP BY flag)
        |SELECT c.flag AS flag, count(*) AS n_rows, med.med AS med, mad.mad AS mad,
        |       CAST(sum(CASE WHEN abs(v - med) > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers
        |FROM c JOIN med ON c.flag = med.flag JOIN mad ON c.flag = mad.flag
        |GROUP BY c.flag, med.med, mad.mad ORDER BY flag""".stripMargin,
      Seq("lineitem")),

    // WEIGHTED median + weighted p90 — the reference's median
    // semantics generalized to weighted points (quantity-weighted
    // price: "the price at which half the VOLUME trades", not half
    // the rows): cumulative-weight ROWS frame over the deterministic
    // sort, answer = smallest value whose running weight reaches the
    // target fraction — `2·cw ≥ W` / `10·cw ≥ 9·W` in pure BIGINT, no
    // division. One group exchange serves both windows and the rollup.
    QueryDef.sqlSurface("q220_weighted_median",
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
        |  FROM lineitem),
        |r AS (
        |  SELECT flag, v, w,
        |         sum(w) OVER (PARTITION BY flag
        |           ORDER BY v, l_orderkey, l_linenumber
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |         sum(w) OVER (PARTITION BY flag) AS tw
        |  FROM c)
        |SELECT flag, CAST(max(tw) AS BIGINT) AS total_weight,
        |       min(CASE WHEN 2 * cw >= tw THEN v END) AS w_median,
        |       min(CASE WHEN 10 * cw >= 9 * tw THEN v END) AS w_p90
        |FROM r GROUP BY flag ORDER BY flag""".stripMargin,
      Seq("lineitem")),

    // MARKET-BASKET association mining (the Apriori candidate-pair
    // pass, Agrawal & Srikant 1994): parts co-purchased within an
    // order, ranked by co-occurrence support and LIFT = P(ab)/(P(a)
    // ·P(b)) in exact basis points — the batch-mining sibling of
    // q149's adjacent-bigram collocations. Scale shape: the pair
    // enumeration is ONE self-equi-join on the order key whose
    // fan-out is bounded by basket size squared (baskets are bounded,
    // the corpus is not — the q120 argument), pair support
    // partial-collapses map-side, item supports are vocab-sized
    // equi-joins and the order count broadcasts. Lift magnitudes:
    // 10000·n_ab·N < 2^63 through N ~ 3·10⁷ baskets; shard by a
    // basket-hash split above that and merge counts.
    QueryDef("q228_basket_assoc",
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT count(DISTINCT o) AS n_orders FROM b),
        |ic AS (SELECT p, count(*)::BIGINT AS n_p FROM b GROUP BY p),
        |pr AS (
        |  SELECT x.p AS pa, y.p AS pb, count(*)::BIGINT AS n_ab
        |  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
        |  GROUP BY x.p, y.p)
        |SELECT pa, pb, n_ab,
        |       ((10000 * n_ab * n_orders) // (ia.n_p * ib.n_p))::BIGINT AS lift_bp
        |FROM pr JOIN ic ia ON ia.p = pa JOIN ic ib ON ib.p = pb
        |     CROSS JOIN n
        |ORDER BY n_ab DESC, lift_bp DESC, pa, pb LIMIT 25""".stripMargin) {
      (spark, dir) =>
        val b = Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val n = b.agg(countDistinct(col("o")).as("n_orders"))
        val ic = b.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
        // item supports attach at BASKET grain, before pairing: the
        // pair frame (the largest frame in the plan — |baskets|·k²
        // rows) is never exchanged again after its aggregation.
        // Measured at sf1: the first cut joined ic onto the pair frame
        // twice post-agg, tripling exchanged bytes (587 MB for 10×
        // data); this shape cut it to one basket-grain join.
        val bw = b.join(ic, Seq("p"))
        val pr = bw.as("x")
          .join(bw.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
          .agg(count(lit(1)).as("n_ab"),
            min(col("x.n_p")).as("na"), min(col("y.n_p")).as("nb"))
        pr.crossJoin(broadcast(n))
          .select(col("pa"), col("pb"), col("n_ab"),
            expr("(10000L * n_ab * n_orders) DIV (na * nb)").as("lift_bp"))
          .orderBy(col("n_ab").desc, col("lift_bp").desc, col("pa"), col("pb"))
          .limit(25)
    },

    // DATA-QUALITY audit: referential integrity + key uniqueness
    // across the star schema in ONE ANSI statement — the dbt-style
    // contract check a warehouse runs after every load. Each FK check
    // is a LEFT JOIN orphan count (broadcast-able dimension sides, the
    // fact scans stay pruned to the key column); each PK check is
    // count − count(DISTINCT). All-zero violations IS the contract:
    // the gate pins that the engine's joins/aggregates agree with the
    // oracle on exactly-zero, and any fixture corruption fails loudly.
    QueryDef.sqlSurface("q230_integrity_audit",
      """SELECT 'fk_lineitem_orders' AS chk, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_violations
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'fk_orders_customer', count(*),
        |       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT)
        |FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'fk_lineitem_part', count(*),
        |       CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT)
        |FROM lineitem l2 LEFT JOIN part p ON l2.l_partkey = p.p_partkey
        |UNION ALL
        |SELECT 'pk_orders', count(*),
        |       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'pk_customer', count(*),
        |       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
        |FROM customer
        |ORDER BY chk""".stripMargin,
      Seq("lineitem", "orders", "customer", "part"))
    ,

    // HIGHER central moments — skewness + excess kurtosis per group
    // from EXACT integer sufficient statistics (the q213 correlation
    // discipline extended to 3rd/4th powers): Σq..Σq⁴ are BIGINT sums
    // of bounded quantities (q ≤ 50 ⇒ q⁴ ≤ 6.25e6 — exact through
    // ~10¹² rows), so the partial aggregation is order-free, and the
    // final doubles come from ONE fixed IEEE tree shared verbatim by
    // both engines (sqlSurface), making the gate hash-exact on floats.
    QueryDef.sqlSurface("q236_higher_moments",
      """WITH s AS (
        |  SELECT l_returnflag AS flag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |              AS BIGINT) AS s2,
        |         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
        |              * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
        |         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
        |              * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |              AS BIGINT) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT flag, n, s1 / n AS mean,
        |         s2 / n - (s1 / n) * (s1 / n) AS m2,
        |         s3 / n - 3 * (s1 / n) * (s2 / n)
        |           + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |         s4 / n - 4 * (s1 / n) * (s3 / n)
        |           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM s)
        |SELECT flag, n, mean, m2,
        |       m3 / (sqrt(m2) * m2) AS skewness,
        |       m4 / (m2 * m2) - 3 AS excess_kurtosis
        |FROM m ORDER BY flag""".stripMargin,
      Seq("lineitem")),

    // MANN–WHITNEY rank-sum (Wilcoxon) between the 'R' and 'N' return
    // slices — the nonparametric "did the distribution shift"
    // companion to q224's mean-shift detector. Tie handling is the
    // textbook average rank kept EXACT by doubling: a tie group
    // starting above `lo` smaller values with `cnt` members has
    // 2·avgrank = 2·lo + cnt + 1 — so 2U and the AUC effect size
    // (P(A>B) + ½P(A=B), in basis points) are pure BIGINT. The corpus
    // collapses to the distinct-value grain map-side; the rank scan is
    // one window over that bounded frame.
    QueryDef("q237_rank_sum",
      """WITH c AS (
        |  SELECT l_returnflag AS g,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |vc AS (
        |  SELECT v, CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         count(*)::BIGINT AS cnt
        |  FROM c GROUP BY v),
        |r AS (
        |  SELECT v, ca, cnt,
        |         coalesce(sum(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |  FROM vc),
        |agg AS (
        |  SELECT CAST(sum(ca * (2 * lo + cnt + 1)) AS BIGINT) AS r2a,
        |         CAST(sum(ca) AS BIGINT) AS na,
        |         CAST(sum(cnt - ca) AS BIGINT) AS nb
        |  FROM r)
        |SELECT na, nb, r2a - na * (na + 1) AS u2a,
        |       (r2a - na * (na + 1))
        |         // greatest(1, (2 * na * nb) // 10000) AS auc_bp
        |FROM agg""".stripMargin) { (spark, dir) =>
      val c = Tables.load(spark, dir, "lineitem")
        .where(col("l_returnflag").isin("R", "N"))
        .select(col("l_returnflag").as("g"),
          round(col("l_extendedprice") * 100).cast("long").as("v"))
      val vc = c.groupBy(col("v"))
        .agg(sum(when(col("g") === "R", 1L).otherwise(0L)).as("ca"),
          count(lit(1)).as("cnt"))
      // Range-partitioned rank: price cents are near-unique, so one
      // global ORDER BY v window would single-partition-sort a
      // corpus-proportional frame. Instead: bucket by v DIV 2^16 (the
      // bucket count is bounded by the VALUE RANGE, not the corpus,
      // and each bucket holds ≤65536 distinct cent values), cumulate
      // bucket totals over that bounded frame, then rank WITHIN each
      // bucket in parallel; lo = bucket offset + intra-bucket prefix.
      // Identical to the oracle's global cumulative sum.
      val vb = vc.withColumn("bkt", expr("v DIV 65536L"))
      val wB = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bOff = vb.groupBy(col("bkt")).agg(sum(col("cnt")).as("bcnt"))
        .withColumn("boff", coalesce(sum(col("bcnt")).over(wB), lit(0L)))
        .select(col("bkt"), col("boff"))
      val wIn = Window.partitionBy(col("bkt")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      vb.join(broadcast(bOff), Seq("bkt"))
        .withColumn("lo",
          col("boff") + coalesce(sum(col("cnt")).over(wIn), lit(0L)))
        .agg(sum(col("ca") * (lit(2) * col("lo") + col("cnt") + 1)).as("r2a"),
          sum(col("ca")).as("na"),
          sum(col("cnt") - col("ca")).as("nb"))
        .select(col("na"), col("nb"),
          (col("r2a") - col("na") * (col("na") + 1)).as("u2a"),
          // denominator pre-divided: 10⁴·u2a overflows BIGINT once
          // na·nb reaches ~10¹⁵ (sf10 magnitudes); u2a ≤ 2·na·nb, so
          // dividing the denominator instead costs ≤1 bp quantization
          // and keeps every intermediate ≤ 2·na·nb
          expr("(r2a - na * (na + 1)) DIV greatest(1L, (2 * na * nb) DIV 10000)")
            .as("auc_bp"))
    },

    // CHI-SQUARED independence over the (lang × source) document
    // contingency table — "is the crawl mix shifting across
    // languages". Cells are emitted PER ROW (no cross-cell double
    // sum — a float total would be partition-order-dependent); each
    // cell's expected count and contribution come from one fixed IEEE
    // tree shared verbatim by both engines. The contingency rollup is
    // one map-side-combined agg; the margins are broadcast-size.
    QueryDef.sqlSurface("q238_chi_squared",
      """WITH o AS (
        |  SELECT lang, source, count(*) AS obs
        |  FROM documents GROUP BY lang, source),
        |rm AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS r FROM o GROUP BY lang),
        |cm AS (SELECT source, CAST(sum(obs) AS BIGINT) AS c FROM o GROUP BY source),
        |n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o)
        |SELECT o.lang AS lang, o.source AS source, CAST(obs AS BIGINT) AS obs,
        |       (r * c) / n AS expected,
        |       (obs - (r * c) / n) * (obs - (r * c) / n) / ((r * c) / n)
        |         AS contrib
        |FROM o JOIN rm ON o.lang = rm.lang JOIN cm ON o.source = cm.source
        |     CROSS JOIN n
        |ORDER BY lang, source""".stripMargin,
      Seq("documents")),

    // DETERMINISTIC Poisson bootstrap (the online/streaming bootstrap
    // — Oza & Russell 2001; Kleiner et al.'s resampling-at-scale
    // posture): 16 replicate means of per-flag price, where row r's
    // weight in replicate b is Poisson(1) inverted from the md5-bp
    // uniform (thresholds = cumulative pmf in basis points) — so the
    // "random" resample is a pure column expression, reprocessing-
    // stable, and the oracle replays every replicate EXACTLY. One
    // corpus scan computes all 16 weighted sums map-side (conditional
    // aggregation); the CI is the 2nd/15th order statistic of the 16
    // means per flag, in integer micro-cents.
    QueryDef("q241_poisson_bootstrap", {
      val reps = (0 until 16).map { b =>
        s"""SELECT flag, $b AS b,
           |  CAST(sum(w$b * v) AS BIGINT) AS swv,
           |  CAST(sum(w$b) AS BIGINT) AS sw
           |FROM c GROUP BY flag""".stripMargin
      }.mkString("\nUNION ALL\n")
      val wCols = (0 until 16).map { b =>
        val u = s"('0x' || substr(h, ${1 + 2 * b}, 2))::BIGINT"
        s"""CASE WHEN $u < 94 THEN 0 WHEN $u < 188 THEN 1
           |     WHEN $u < 236 THEN 2 WHEN $u < 251 THEN 3
           |     ELSE 4 END AS w$b""".stripMargin
      }.mkString(",\n")
      s"""WITH r0 AS (
         |  SELECT l_returnflag AS flag,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         |         md5('bs:' || l_orderkey || ':' || l_linenumber) AS h
         |  FROM lineitem),
         |c AS (SELECT flag, v,
         |$wCols
         |FROM r0),
         |reps0 AS ($reps),
         |reps AS (
         |  SELECT flag, b, swv, greatest(1, sw) AS sw FROM reps0),
         |means AS (
         |  SELECT flag, b,
         |         (swv // sw) * 1000000 + ((swv % sw) * 1000000) // sw AS m,
         |         row_number() OVER (PARTITION BY flag
         |           ORDER BY (swv // sw) * 1000000
         |                    + ((swv % sw) * 1000000) // sw, b) AS rn
         |  FROM reps),
         |ex AS (SELECT flag,
         |              CAST((sum(v) // count(*)) * 1000000
         |                   + ((sum(v) % count(*)) * 1000000) // count(*)
         |                   AS BIGINT) AS mean_micro
         |       FROM c GROUP BY flag)
         |SELECT ex.flag AS flag, mean_micro,
         |       CAST(max(CASE WHEN rn = 2 THEN m END) AS BIGINT) AS boot_lo,
         |       CAST(max(CASE WHEN rn = 15 THEN m END) AS BIGINT) AS boot_hi
         |FROM ex JOIN means ON ex.flag = means.flag
         |GROUP BY ex.flag, mean_micro ORDER BY flag""".stripMargin
    }) { (spark, dir) =>
      // ONE md5 per row, sliced into 16 two-hex-digit uniforms (the
      // hash-once bootstrap trick) — 16 md5/row measured ~6 s at
      // sf0.1, hash-once is 16× less digest work; pmf thresholds are
      // the cumulative Poisson(1) probabilities × 256
      val base = Tables.loadParallel(spark, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("v"),
          md5(concat(lit("bs:"), col("l_orderkey"), lit(":"),
            col("l_linenumber"))).as("h"))
      def w(b: Int): Column = {
        val u = conv(substring(col("h"), 1 + 2 * b, 2), 16, 10).cast("long")
        when(u < 94, 0L).when(u < 188, 1L).when(u < 236, 2L)
          .when(u < 251, 3L).otherwise(4L)
      }
      val weighted = base.select(
        Seq(col("flag"), col("v")) ++ (0 until 16).map(b => w(b).as(s"w$b")): _*)
      val aggCols = Seq(sum(col("v")).as("sv"), count(lit(1)).as("cnt")) ++
        (0 until 16).flatMap(b => Seq(
          sum(col(s"w$b") * col("v")).as(s"swv$b"),
          sum(col(s"w$b")).as(s"sw$b")))
      val stats = weighted.groupBy(col("flag"))
        .agg(aggCols.head, aggCols.tail: _*)
      // micro-mean via the DomainMix exact decomposition — the naive
      // 1e6·swv product overflows BIGINT at ~10¹³ aggregate cents
      // (observed at the sf10/100× point); (a DIV b)·1e6 +
      // ((a%b)·1e6) DIV b is identical for non-negative operands with
      // intermediates bounded by max(a, b·1e6)
      // greatest(1, sw): a replicate where EVERY row of a tiny group
      // draws Poisson weight 0 (probability (94/256)^n) must yield
      // mean 0 in both engines, not NULL here vs a DuckDB division
      // error — the zero-guard is part of the oracle contract.
      val means = stats.select(col("flag") +: (0 until 16).map(b =>
        expr(s"(swv$b DIV greatest(1L, sw$b)) * 1000000L" +
          s" + ((swv$b % greatest(1L, sw$b)) * 1000000L)" +
          s" DIV greatest(1L, sw$b)").as(s"m$b")): _*)
        .select(col("flag"), explode(array((0 until 16).map(b =>
          col(s"m$b")): _*)).as("m"))
      val wRank = Window.partitionBy(col("flag")).orderBy(col("m"))
      val ci = means.withColumn("rn", row_number().over(wRank))
        .groupBy(col("flag"))
        .agg(max(when(col("rn") === 2, col("m"))).as("boot_lo"),
          max(when(col("rn") === 15, col("m"))).as("boot_hi"))
      stats.select(col("flag"),
          expr("(sv DIV cnt) * 1000000L + ((sv % cnt) * 1000000L) DIV cnt")
            .as("mean_micro"))
        .join(ci, Seq("flag"))
        .select(col("flag"), col("mean_micro"), col("boot_lo"), col("boot_hi"))
        .orderBy(col("flag"))
    },

    // JOIN-SIZE estimation from count-min sketch INNER PRODUCTS
    // (Alon–Gibbons–Matias–Szegedy; the optimizer-statistics
    // primitive: |A ⋈ B| = Σ_k a(k)·b(k), estimated as min over rows
    // of the two sketches' row dot products — never under the truth).
    // Sides are the 'R' vs 'N' supplier slices; each side costs ONE
    // O(cells) sketch agg, the estimate is arithmetic on two 256-cell
    // blobs — the corpus is never joined to answer "how big would
    // this join be". The md5-cell family is replayable, so every row
    // dot, the estimate, the exact size, and the never-under flag all
    // hash-compare against the DuckDB replay.
    QueryDef("q243_join_size_sketch",
      """WITH a AS (SELECT CAST(l_suppkey AS VARCHAR) AS t FROM lineitem
        |           WHERE l_returnflag = 'R'),
        |b AS (SELECT CAST(l_suppkey AS VARCHAR) AS t FROM lineitem
        |      WHERE l_returnflag = 'N'),
        |ca AS (
        |  SELECT d, ('0x' || substr(md5('cm' || d || ':' || t), 1, 7))::BIGINT % 64 AS idx,
        |         count(*)::BIGINT AS c
        |  FROM a CROSS JOIN generate_series(0, 3) g(d) GROUP BY 1, 2),
        |cb AS (
        |  SELECT d, ('0x' || substr(md5('cm' || d || ':' || t), 1, 7))::BIGINT % 64 AS idx,
        |         count(*)::BIGINT AS c
        |  FROM b CROSS JOIN generate_series(0, 3) g(d) GROUP BY 1, 2),
        |dots AS (
        |  SELECT ca.d AS d, CAST(sum(ca.c * cb.c) AS BIGINT) AS dot
        |  FROM ca JOIN cb ON ca.d = cb.d AND ca.idx = cb.idx
        |  GROUP BY ca.d),
        |est AS (SELECT CAST(min(dot) AS BIGINT) AS est FROM dots),
        |ex AS (
        |  SELECT CAST(sum(na * nb) AS BIGINT) AS exact FROM
        |    (SELECT t, count(*)::BIGINT AS na FROM a GROUP BY t) xa
        |    JOIN (SELECT t, count(*)::BIGINT AS nb FROM b GROUP BY t) xb
        |    USING (t))
        |SELECT d, dot, est, exact,
        |       CAST((10000 * est) // exact AS BIGINT) AS ratio_bp,
        |       est >= exact AS never_under
        |FROM dots CROSS JOIN est CROSS JOIN ex
        |ORDER BY d""".stripMargin) { (spark, dir) =>
      graft.functions.GraftFunctions.register(spark)
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag").as("f"),
          col("l_suppkey").cast("string").as("t"))
      def sketch(flag: String, out: String) =
        li.where(col("f") === flag)
          .agg(graft.functions.GraftFunctions.count_min(col("t"), 64).as(out))
      val dots = sketch("R", "ska").crossJoin(sketch("N", "skb"))
        .select(explode(expr(
          """transform(sequence(0, 3), d -> struct(
            |  cast(d AS BIGINT) AS d,
            |  aggregate(sequence(1, 64), 0L, (acc, i) ->
            |    acc + element_at(ska, cast(d * 64 + i AS INT))
            |        * element_at(skb, cast(d * 64 + i AS INT))) AS dot))"""
            .stripMargin)).as("x"))
        .select(col("x.d").as("d"), col("x.dot").as("dot"))
      val est = dots.agg(min(col("dot")).as("est"))
      val ex = li.where(col("f") === "R").groupBy(col("t"))
        .agg(count(lit(1)).as("na"))
        .join(li.where(col("f") === "N").groupBy(col("t"))
          .agg(count(lit(1)).as("nb")), Seq("t"))
        .agg(sum(col("na") * col("nb")).cast("long").as("exact"))
      dots.crossJoin(broadcast(est)).crossJoin(broadcast(ex))
        .select(col("d"), col("dot"), col("est"), col("exact"),
          expr("(10000L * est) DIV exact").as("ratio_bp"),
          (col("est") >= col("exact")).as("never_under"))
        .orderBy(col("d"))
    },

    // INCREMENTAL aggregate maintenance — the materialized-view
    // refresh algebra (the q146 index-merge discipline applied to
    // aggregates): the base rollup (80% of lineitem) folds in the
    // delta rollup (the other 20%) as a cell-wise merge — count/sum
    // add, min/min and max/max — through ONE full-outer group join of
    // two AGGREGATE-sized frames; the corpus is touched once per
    // slice, never re-scanned at refresh. The gate demands
    // merged == from-scratch rebuild of the full table (the oracle
    // computes the rebuild), so the merge algebra cannot drift.
    QueryDef("q245_ivm_agg",
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
        |       CAST(min(round(l_extendedprice * 100)) AS BIGINT) AS min_cents,
        |       CAST(max(round(l_extendedprice * 100)) AS BIGINT) AS max_cents
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"),
          col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("c"),
          col("l_orderkey"))
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("flag"), col("status"))
          .agg(count(lit(1)).as("n_rows"), sum(col("q")).as("qty_sum"),
            min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
      val base = rollup(li.where(col("l_orderkey") % 5 =!= 0))
      val delta = rollup(li.where(col("l_orderkey") % 5 === 0))
      val d2 = delta.select(col("flag"), col("status"),
        col("n_rows").as("d_n"), col("qty_sum").as("d_q"),
        col("min_cents").as("d_mn"), col("max_cents").as("d_mx"))
      base.join(d2, Seq("flag", "status"), "full_outer")
        .select(col("flag"), col("status"),
          (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("qty_sum"), lit(0L)) + coalesce(col("d_q"), lit(0L)))
            .as("qty_sum"),
          least(coalesce(col("min_cents"), col("d_mn")),
            coalesce(col("d_mn"), col("min_cents"))).as("min_cents"),
          greatest(coalesce(col("max_cents"), col("d_mx")),
            coalesce(col("d_mx"), col("max_cents"))).as("max_cents"))
        .orderBy(col("flag"), col("status"))
    },

    // BENFORD first-digit audit over price cents — the fabricated-data
    // forensic (synthetic or truncated amounts break the log-uniform
    // digit law): observed share per leading digit vs the Benford
    // expectation ln(1+1/d)/ln(10), both in micro-units — shares by
    // integer division, the expectation by the DSIR half-up floor on
    // the shared double tree. Map-only digit extraction (first char of
    // the integer's decimal form — positive cents, identical in both
    // engines), one 9-cell agg.
    QueryDef("q249_benford_audit",
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice > 0),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |      FROM v),
        |o AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM o)
        |SELECT digit, n,
        |       CAST((1000000 * n) // tot AS BIGINT) AS share_micro,
        |       CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000 + 0.5)
        |            AS BIGINT) AS benford_micro,
        |       CAST((1000000 * n) // tot
        |            - floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000 + 0.5)
        |            AS BIGINT) AS delta_micro
        |FROM o CROSS JOIN t ORDER BY digit""".stripMargin) { (spark, dir) =>
      val o = Tables.load(spark, dir, "lineitem")
        .where(col("l_extendedprice") > 0)
        .select(substring(round(col("l_extendedprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val t = o.agg(sum(col("n")).cast("long").as("tot"))
      val benford = floor(log(lit(1.0) + lit(1.0) / col("digit"))
        / log(lit(10.0)) * 1000000 + 0.5).cast("long")
      o.crossJoin(broadcast(t))
        .select(col("digit"), col("n"),
          expr("(1000000L * n) DIV tot").as("share_micro"),
          benford.as("benford_micro"),
          (expr("(1000000L * n) DIV tot") - benford).as("delta_micro"))
        .orderBy(col("digit"))
    },

    // SQL PIVOT surface: the literal `PIVOT (agg FOR col IN (...))`
    // statement a warehouse user keeps verbatim — Spark parses it
    // natively; DuckDB's PIVOT dialect differs, so the oracle is the
    // semantically-identical conditional aggregation (which is also
    // exactly what Catalyst rewrites PIVOT into — `RewritePivot`).
    // Cents cast BEFORE the sum so both engines aggregate exact
    // BIGINTs.
    QueryDef("q254_pivot_sql",
      """SELECT l_returnflag AS flag,
        |       CAST(sum(CASE WHEN l_linestatus = 'O'
        |                     THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
        |            AS BIGINT) AS open_cents,
        |       CAST(sum(CASE WHEN l_linestatus = 'F'
        |                     THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
        |            AS BIGINT) AS filled_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin) {
      (spark, dir) =>
        Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
        spark.sql(
          """SELECT * FROM (
            |  SELECT l_returnflag AS flag, l_linestatus,
            |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            |  FROM lineitem)
            |PIVOT (sum(cents) FOR l_linestatus IN ('O' AS open_cents,
            |                                       'F' AS filled_cents))
            |ORDER BY flag""".stripMargin)
    },

    // GROUP BY ALL — the analyst-ergonomics surface both engines
    // added (Spark 3.4+, DuckDB): every non-aggregate select item
    // becomes a grouping key. ONE text runs verbatim on both
    // (sqlSurface — the strongest parity statement), beside the
    // explicit-key q01 and the GROUPING SETS q34.
    QueryDef.sqlSurface("q257_group_by_all",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |       count(*) AS n_lines
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      Seq("lineitem")),

    // SQL UNPIVOT surface (q254's inverse): literal `UNPIVOT (v FOR
    // metric IN (...))` through Spark's parser; the oracle is the
    // UNION ALL expansion every engine rewrites it into. NULL rows
    // are EXCLUDED (both the Spark default and the explicit oracle
    // filter), so the two surfaces agree on missing cells.
    QueryDef("q255_unpivot_sql",
      """WITH w AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |         CAST(count(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT flag, metric, v FROM (
        |  SELECT flag, 'qty' AS metric, qty AS v FROM w
        |  UNION ALL SELECT flag, 'n_lines', n_lines FROM w) u
        |WHERE v IS NOT NULL
        |ORDER BY flag, metric""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
      spark.sql(
        """WITH w AS (
          |  SELECT l_returnflag AS flag,
          |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
          |         CAST(count(*) AS BIGINT) AS n_lines
          |  FROM lineitem GROUP BY l_returnflag)
          |SELECT flag, metric, v FROM w
          |UNPIVOT (v FOR metric IN (qty, n_lines))
          |ORDER BY flag, metric""".stripMargin)
    },

    // JOIN-KEY SKEW PROFILER: the diagnostic a salting / AQE-skew
    // decision reads before a big join — per-key fanout of the
    // orders-side join key, the 5 heaviest keys, and the global
    // (n_keys, n_rows, max_fanout) summary in one pass. ONE common
    // ANSI text runs on both engines (sqlSurface). Scale shape: the
    // fanout frame is a map-side-combined hash agg ON the join key
    // (the shuffle it profiles would pay anyway), the top-5 is a
    // bounded heap (Spark plans TakeOrderedAndProject — deliberately
    // ORDER BY..LIMIT, not a corpus-wide window rank), and the
    // summary is a second map-side-combined agg over the key frame.
    QueryDef.sqlSurface("q267_key_skew_profile",
      """WITH f AS (
        |  SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS fanout
        |  FROM lineitem GROUP BY l_orderkey),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(sum(fanout) AS BIGINT) AS n_rows,
        |         CAST(max(fanout) AS BIGINT) AS max_fanout
        |  FROM f),
        |t AS (SELECT key, fanout FROM f ORDER BY fanout DESC, key LIMIT 5)
        |SELECT key, fanout, n_keys, n_rows FROM (
        |  SELECT CAST(-1 AS BIGINT) AS key, max_fanout AS fanout,
        |         n_keys, n_rows
        |  FROM s
        |  UNION ALL
        |  SELECT key, fanout, CAST(0 AS BIGINT) AS n_keys,
        |         CAST(0 AS BIGINT) AS n_rows
        |  FROM t) u
        |ORDER BY key""".stripMargin,
      Seq("lineitem")),

    // EXACT TRIMMED (WINSORIZED-STYLE) MEAN per group, dropping
    // n DIV 20 rows from each end — outlier-robust central tendency in
    // exact integer micro-units. The ranking rides on the DISTINCT
    // CENT VALUE grain (one cumulative window over per-(flag, value)
    // counts — bounded by the value domain, NOT the corpus: the
    // q237-advice pattern made load-bearing): each distinct value
    // contributes overlap(cumulative-rank-interval, [lo, hi]) copies
    // to the trimmed sum, so ties need no row-level rank at all.
    QueryDef("q275_trimmed_mean",
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |n AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY flag),
        |w AS (
        |  SELECT c.flag, v, c.c,
        |         CAST(sum(c.c) OVER (PARTITION BY c.flag ORDER BY v) AS BIGINT) AS cum,
        |         n.n AS n
        |  FROM c JOIN n ON n.flag = c.flag),
        |trim AS (
        |  SELECT flag, n, n // 20 + 1 AS lo, n - n // 20 AS hi,
        |         v, c, cum FROM w),
        |keep AS (
        |  SELECT flag, n, lo, hi, v,
        |         least(cum, hi) - greatest(cum - c + 1, lo) + 1 AS k
        |  FROM trim WHERE least(cum, hi) >= greatest(cum - c + 1, lo))
        |SELECT flag, CAST(any_value(hi - lo + 1) AS BIGINT) AS n_kept,
        |       CAST(sum(k * v) AS BIGINT) AS kept_cents,
        |       CAST((1000000 * sum(k * v)) // sum(k) AS BIGINT) AS mean_micro
        |FROM keep GROUP BY flag ORDER BY flag""".stripMargin) { (spark, dir) =>
      val c = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("v"))
        .groupBy("flag", "v").agg(count(lit(1)).as("c"))
      val n = c.groupBy("flag").agg(sum(col("c")).as("n"))
      val wspec = org.apache.spark.sql.expressions.Window
        .partitionBy(col("flag")).orderBy(col("v"))
      val w = c.join(n, "flag")
        .withColumn("cum", sum(col("c")).over(wspec))
        .withColumn("lo", expr("n DIV 20 + 1"))
        .withColumn("hi", expr("n - n DIV 20"))
      val keep = w
        .withColumn("k",
          least(col("cum"), col("hi")) -
            greatest(col("cum") - col("c") + 1, col("lo")) + 1)
        .where(least(col("cum"), col("hi")) >=
          greatest(col("cum") - col("c") + 1, col("lo")))
      keep.groupBy("flag")
        .agg(first(col("hi") - col("lo") + 1).as("n_kept"),
          sum(col("k") * col("v")).cast("long").as("kept_cents"),
          expr("CAST((1000000 * sum(k * v)) DIV sum(k) AS BIGINT)")
            .as("mean_micro"))
        .orderBy("flag")
    },

    // PARETO FRONTIER (2-D skyline): the orders no other order
    // dominates on (earlier date, higher price) — the classic
    // multi-criteria shortlist (best-tradeoff sweep in tuning /
    // curation). NOT the textbook O(n²) dominance anti-join: dedupe
    // to points, reduce to the per-DATE max price (any lower price on
    // the same date is dominated), then one running-max window over
    // the date-grain frame keeps exactly the dates whose max price
    // strictly exceeds every earlier date's — the bounded-grain
    // pattern (q275/q212): the unpartitioned window sees one row per
    // distinct date (~2.4k over the TPC-H range), never the corpus.
    // ONE ANSI text for both engines.
    QueryDef.sqlSurface("q281_pareto_frontier",
      """WITH pts AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |dm AS (SELECT d, max(cents) AS mc,
        |              CAST(sum(n_orders) AS BIGINT) AS nd
        |       FROM pts GROUP BY d),
        |r AS (SELECT d, mc,
        |             max(mc) OVER (ORDER BY d
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |      FROM dm),
        |f AS (SELECT d, mc FROM r WHERE prevmax IS NULL OR mc > prevmax)
        |SELECT CAST(f.d AS STRING) AS frontier_date, f.mc AS cents, p.n_orders
        |FROM f JOIN pts p ON p.d = f.d AND p.cents = f.mc
        |ORDER BY f.d""".stripMargin,
      Seq("orders"))
  )
}
