package graft.queries

/** The full TPC-H-shaped analytic sweep, expressed as SQL-surface
  * gates: ONE ANSI string per query runs verbatim on both Spark
  * (`spark.sql` over the fixture temp views) and DuckDB — the
  * strongest statement that a reference user's whole dashboard-style
  * workload migrates unchanged. Continues q85 (Q3) / q86 (Q5) from
  * CoreQueries with the remaining queries expressible on the fixture
  * schema; shapes whose TPC-H columns the fixture lacks
  * (l_commitdate / l_receiptdate / l_shipmode / c_phone /
  * p_container, and the partsupp table) are adapted to equivalent
  * predicates over existing columns, noted per query.
  *
  * Numeric discipline (same as q01/q85): revenue-style double sums
  * route through DECIMAL(20,4) — exact and associative, so shuffle /
  * merge order can't drift the result — then one CAST to DOUBLE;
  * ratio queries divide two such doubles (one IEEE op, identical on
  * both engines). ORDER BY always carries a unique tie-break when a
  * LIMIT follows. Dates use the fixture's 1995-2001 span.
  *
  * At 100 TB these are exactly the plans Catalyst should own: selective
  * dimension filters broadcast (customer/nation/region/part sides),
  * the lineitem scan keeps only the referenced columns + pushed
  * predicates, aggregation is partial map-side, and the IN/EXISTS
  * subqueries decorrelate to broadcast semi/anti joins (proved by
  * q82-q84's plans).
  */
object TpchQueries {

  def defs: Seq[QueryDef] = Seq(

    // TPC-H Q6 shape — forecast revenue change: the classic
    // single-table selective scan-agg. The whole query should compile
    // to one WholeStageCodegen span over a parquet scan with all
    // three predicates pushed.
    QueryDef.sqlSurface("q88_sql_tpch_q6",
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
      Seq("lineitem")),

    // TPC-H Q7 shape — volume shipping between trading blocs. The
    // reference query pins two nations; the fixture spreads traffic
    // over 25 nations so a single pair is empty at sf0.001 — the
    // region-pair form (ASIA<->EUROPE) keeps the dual-alias nation
    // join AND stays populated at every SF.
    QueryDef.sqlSurface("q89_sql_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(sum(CAST(volume AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |             l_extendedprice * (1.0 - l_discount) AS volume
        |      FROM supplier, lineitem, orders, customer, nation n1, nation n2, region r1, region r2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
        |        AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
        |          OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
        |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
      Seq("supplier", "lineitem", "orders", "customer", "nation", "region")),

    // TPC-H Q8 shape — national market share: the 8-way join with a
    // conditional-over-total ratio per year. Numerator and denominator
    // are separate exact decimal sums, divided once as doubles.
    QueryDef.sqlSurface("q90_sql_tpch_q8",
      """SELECT o_year,
        |       CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume_d
        |                     ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
        |       / CAST(sum(volume_d) AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |             CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4)) AS volume_d,
        |             n2.n_name AS nation
        |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        |        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        |        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |        AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |        AND p_type = 'ECONOMY') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")),

    // TPC-H Q10 shape — returned-item reporting: one quarter of
    // orders, returned lines only, revenue per customer, top 20.
    // (c_phone/c_address/c_comment don't exist in the fixture and are
    // dropped from the output list; the join/agg shape is unchanged.)
    QueryDef.sqlSurface("q91_sql_tpch_q10",
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
        |       c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
      Seq("customer", "orders", "lineitem", "nation")),

    // TPC-H Q13 shape — customer order-count distribution: left outer
    // join with a join-condition filter (the fixture has no o_comment,
    // so the excluded class is a priority instead), then a
    // count-of-counts. Exercises null-preserving outer-join counting:
    // count(o_orderkey) must skip nulls from unmatched customers.
    QueryDef.sqlSurface("q92_sql_tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |          AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
      Seq("customer", "orders")),

    // TPC-H Q14 shape — promotion effect: conditional revenue share
    // for one month (p_type is a single word in the fixture, so
    // equality replaces LIKE 'PROMO%').
    QueryDef.sqlSurface("q93_sql_tpch_q14",
      """SELECT 100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |                 THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))
        |                 ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
        |       / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
      Seq("lineitem", "part")),

    // TPC-H Q17 shape — small-quantity-order revenue. The per-part
    // 0.2*avg(quantity) threshold is written as an explicit derived
    // table (exact decimal sum / count, one double multiply) rather
    // than a correlated avg: sum/avg of doubles inside a correlated
    // subquery is order-dependent and can flip a boundary row
    // (brand only — the fixture has no p_container).
    QueryDef.sqlSurface("q94_sql_tpch_q17",
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem, part,
        |     (SELECT l_partkey AS t_partkey,
        |             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / count(*)) AS t_avg
        |      FROM lineitem GROUP BY l_partkey) t
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND t_partkey = l_partkey
        |  AND l_quantity < t_avg""".stripMargin,
      Seq("lineitem", "part")),

    // TPC-H Q18 shape — large-volume customers: IN over a HAVING
    // subquery (group-then-filter on an exact decimal sum), re-joined
    // and re-aggregated. The date key idiom matches q85 (raw
    // timestamp outputs are unproven in the driver compare).
    QueryDef.sqlSurface("q95_sql_tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(year(o_orderdate)*10000 + month(o_orderdate)*100
        |            + day(o_orderdate) AS BIGINT) AS o_date_key,
        |       o_totalprice,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING sum(CAST(l_quantity AS DECIMAL(20,4))) > 150)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
      Seq("customer", "orders", "lineitem")),

    // TPC-H Q19 shape — discounted revenue under OR'd multi-column
    // predicate groups (brand x size x quantity bands; the fixture has
    // no p_container/l_shipmode). Tests disjunctive predicate
    // pushdown across a join.
    QueryDef.sqlSurface("q96_sql_tpch_q19",
      """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
      Seq("lineitem", "part")),

    // TPC-H Q22 shape — global sales opportunity: above-average-
    // balance customers with no urgent order, grouped by nation (the
    // fixture has no c_phone for country codes; every customer has
    // orders at small SFs, so the anti-join excludes an order CLASS
    // rather than all orders). The scalar average is an exact decimal
    // sum over an exact count — order-independent, safe to gate.
    QueryDef.sqlSurface("q97_sql_tpch_q22",
      """SELECT CAST(c_nationkey AS BIGINT) AS cntry, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0.00)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY cntry""".stripMargin,
      Seq("customer", "orders")),

    // TPC-H Q4 shape — order priority checking: EXISTS with a
    // correlated inter-column comparison. The fixture has no
    // l_commitdate/l_receiptdate, so "late line" is a line shipped
    // more than 60 days after the order date — same correlated-EXISTS
    // + date-window shape, and the interval literal is common dialect.
    QueryDef.sqlSurface("q98_sql_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      Seq("orders", "lineitem")),

    // TPC-H Q15 shape — top supplier by quarterly revenue: a shared
    // CTE consumed twice (once as the join input, once under the
    // uncorrelated scalar-max subquery). The equality against the max
    // runs on the EXACT decimal revenue — only the output is cast to
    // double — so a float ulp can never drop the winning supplier.
    // (Supplier address/phone columns don't exist in the fixture;
    // the output keeps key + name + revenue.)
    QueryDef.sqlSurface("q103_sql_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
      Seq("supplier", "lineitem")),

    // TPC-H Q2 shape — minimum-cost supplier: the correlated scalar
    // MIN subquery re-joining the same 4-table chain as the outer
    // query. The fixture has no partsupp, so each lineitem row plays
    // the (part, supplier, cost) offer with cost = l_extendedprice;
    // MIN is exact, so the double equality is deterministic. DISTINCT
    // + full-output ORDER BY make the LIMIT stable when one supplier
    // posts the same price twice.
    QueryDef.sqlSurface("q121_sql_tpch_q2",
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
        |       l_extendedprice AS cost
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 25 AND p_type = 'ECONOMY'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, cost
        |LIMIT 100""".stripMargin,
      Seq("part", "supplier", "lineitem", "nation", "region")),

    // TPC-H Q9 shape — product-type profit: the 5-way join with a
    // per-(nation, year) profit sum and a part-name LIKE filter. The
    // fixture has no ps_supplycost; the cost leg substitutes
    // 0.01 * p_retailprice * l_quantity, keeping the
    // price-minus-cost arithmetic and the part join both load-bearing.
    QueryDef.sqlSurface("q122_sql_tpch_q9",
      """SELECT nation, o_year, CAST(sum(amount_d) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |             CAST(l_extendedprice * (1.0 - l_discount)
        |                  - 0.01 * p_retailprice * l_quantity AS DECIMAL(20,4)) AS amount_d
        |      FROM part, supplier, lineitem, orders, nation
        |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
      Seq("part", "supplier", "lineitem", "orders", "nation")),

    // TPC-H Q11 shape — important stock: group-by over one nation's
    // supply values with an uncorrelated scalar-subquery threshold in
    // HAVING (the same aggregate re-run over the same join, scaled by
    // a fraction). partsupp value -> lineitem l_extendedprice; the
    // exact decimal sums are compared after one double multiply.
    QueryDef.sqlSurface("q123_sql_tpch_q11",
      """SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING sum(CAST(l_extendedprice AS DECIMAL(20,4))) > (
        |  SELECT sum(CAST(l_extendedprice AS DECIMAL(20,4))) * 0.001
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3')
        |ORDER BY value DESC, l_partkey""".stripMargin,
      Seq("lineitem", "supplier", "nation")),

    // TPC-H Q12 shape — shipmode priority split: the two-way
    // conditional count over a joined date window. No
    // l_shipmode/l_commitdate/l_receiptdate in the fixture:
    // return-flag classes 'R'/'A' stand in for the two ship modes and
    // "late" is shipped >60 days after order date (q98's proxy).
    QueryDef.sqlSurface("q124_sql_tpch_q12",
      """SELECT l_returnflag AS shipmode,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey AND l_returnflag IN ('R', 'A')
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      Seq("orders", "lineitem")),

    // TPC-H Q16 shape — supplier-part relationship counting:
    // count(DISTINCT supplier) per part attribute triple, excluding a
    // NOT IN supplier denylist (negative balances stand in for the
    // complaint-comment filter; lineitem stands in for partsupp).
    QueryDef.sqlSurface("q125_sql_tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
      Seq("lineitem", "part", "supplier")),

    // TPC-H Q20 shape — part promotion candidates: the nested
    // IN-subquery ladder (suppliers <- shipped-enough grouped
    // lineitems <- name-matched parts) that must decorrelate to
    // semi-joins, never per-row subquery execution. The availqty
    // comparison becomes a HAVING threshold on the exact decimal
    // quantity sum.
    QueryDef.sqlSurface("q126_sql_tpch_q20",
      """SELECT s_name, s_acctbal
        |FROM supplier, nation
        |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_5'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem, part
        |    WHERE l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey
        |    HAVING sum(CAST(l_quantity AS DECIMAL(20,4))) > 50)
        |ORDER BY s_name, s_acctbal""".stripMargin,
      Seq("supplier", "nation", "lineitem", "part")),

    // TPC-H Q21 shape — suppliers who kept waiting orders: the
    // EXISTS + NOT EXISTS pair over the SAME lineitem table correlated
    // on the outer line's order key with a supplier-inequality — the
    // hardest decorrelation in the suite. "Failed its delivery" is
    // l_returnflag = 'R' on finished orders (no receipt/commit dates
    // in the fixture).
    QueryDef.sqlSurface("q127_sql_tpch_q21",
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
      Seq("supplier", "lineitem", "orders", "nation"))
  )
}
