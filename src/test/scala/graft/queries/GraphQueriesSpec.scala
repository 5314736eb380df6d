package graft.queries

import graft.SparkTestBase

/** Invariant + plan pins for the graph gates (values are pinned by the
  * oracle). */
class GraphQueriesSpec extends SparkTestBase {

  test("q208: coefficient bounds, triangle-degree consistency, equi-join plan") {
    val df = graft.SparkEntry.queries("q208_triangle_count")(spark, sf0001)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, deg, tri, bp) =>
      assert(deg >= 2, s"node $id in a triangle needs degree >= 2")
      // a node's triangles are a subset of its neighbor pairs
      assert(tri <= deg * (deg - 1) / 2, s"node $id: $tri > C($deg,2)")
      assert(bp >= 0 && bp <= 10000, s"node $id coeff $bp")
    }
    // results sorted by triangle count desc
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }
}
