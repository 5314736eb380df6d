package graft.queries

import graft.{SparkEntry, SparkTestBase}

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** Independent naive replays of the q281 skyline and q282 record-
  * linkage gates (the RerankSpec convention: no shared code — the
  * replays are textbook O(n²) forms, the gates are the scale forms),
  * plus plan-shape asserts that the scale forms never cartesian. */
class SkylineLinkageSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q281 pareto frontier == naive O(n^2) dominance replay") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS d",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    // textbook dominance: (d1, c1) dominates (d2, c2) iff d1 <= d2,
    // c1 >= c2, and at least one strict
    val pts = orders.toSeq.groupBy(identity).map { case (p, rs) =>
      (p._1, p._2, rs.size.toLong)
    }.toSeq
    val frontier = pts.filter { case (d, c, _) =>
      !pts.exists { case (d2, c2, _) =>
        (d2.isBefore(d) || !d2.isAfter(d) && c2 > c) &&
          !d2.isAfter(d) && c2 >= c
      }
    }.sortBy(_._1.toString)
    val got = SparkEntry.queries("q281_pareto_frontier")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == frontier.map { case (d, c, n) => (d.toString, c, n) })
  }

  test("q281 plan: no cartesian product, no nested-loop join") {
    val phys = SparkEntry.queries("q281_pareto_frontier")(spark, sf)
      .queryExecution.executedPlan
    assert(phys.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(phys.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
  }

  test("q282 record linkage == naive replay (dirty gen + block + verify)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(k: Long): Long = java.lang.Long.parseLong(
      md.digest(s"rl:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7), 16)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val dirty = cust.map { case (k, nat, name) =>
      val hv = h(k)
      val p8 = (hv / 3 % 8).toInt
      val dname = (hv % 3) match {
        case 0 => name.substring(0, 10 + p8) + name.substring(11 + p8)
        case 1 => name.substring(0, 10 + p8) + "x" + name.substring(11 + p8)
        case _ => name
      }
      (k, nat, dname)
    }
    val best = dirty.flatMap { case (crmId, nat, dname) =>
      val cands = cust.filter { case (_, n2, m) =>
        n2 == nat && m.take(10) == dname.take(10)
      }.map { case (ck, _, m) => (ck, lev(dname, m)) }
        .filter(_._2 <= 1)
      if (cands.isEmpty) None
      else {
        val (ck, l) = cands.minBy { case (ck, l) => (l, ck) }
        Some(crmId -> (ck, l))
      }
    }.toMap
    val expect = dirty.groupBy(_._2).map { case (nat, rs) =>
      val n = rs.length.toLong
      val matched = rs.flatMap(r => best.get(r._1))
      val correct = rs.count(r => best.get(r._1).exists(_._1 == r._1))
      (nat.toLong, n, matched.length.toLong, correct.toLong,
        matched.count(_._2 == 0).toLong, matched.count(_._2 == 1).toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q282_record_linkage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the edit family guarantees near-total linkage on this fixture:
    // every dirty record blocks with its own master at lev <= 1
    val totals = got.foldLeft((0L, 0L)) { case ((c, m), r) => (c + r._2, m + r._3) }
    assert(totals._2 == totals._1, "every dirty record should match its block")
  }

  test("q282 plan: candidates come from an equi-join, never a cartesian") {
    val phys = SparkEntry.queries("q282_record_linkage")(spark, sf)
      .queryExecution.executedPlan
    assert(phys.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(phys.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
  }
}
