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

  test("q225: predictions are ordered non-edges with >= 2 witnesses; equi-join plan") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q225_link_prediction")(spark, sf0001)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, cn, bp) =>
      assert(a < b, s"pair ($a,$b) not id-ordered")
      assert(cn >= 2, s"pair ($a,$b) cn=$cn")
      assert(bp > 0 && bp <= 10000, s"pair ($a,$b) jaccard $bp")
    }
    // no predicted pair may already be an edge of the graph
    val edges = SimilarityQueries.mutualKnnEdges(spark, sf0001)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (a, b, _, _) =>
      assert(!edges.contains((a, b)), s"($a,$b) is an existing edge")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q231: hop 0 is exactly the seed census; frontier growth is sane") {
    val rows = graft.SparkEntry.queries("q231_bfs_hops")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // hop 0 = the seed set itself: ids 0..9 that exist as vectors
    val seeds = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"))
      .where(org.apache.spark.sql.functions.col("vec_id") < 10)
      .collect().map(_.getLong(0))
    assert(rows.head == ((0L, seeds.length.toLong, seeds.sum)),
      rows.head.toString)
  }

  test("q232: one fixpoint row; every surviving node has degree >= K in the core") {
    val rows = graft.SparkEntry.queries("q232_kcore")(spark, sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 1, rows.mkString(", "))
    val (nRounds, nNodes, nEdges, _) = rows.head
    assert(nRounds >= 1)
    // a non-empty 3-core needs at least 4 nodes and min degree 3
    if (nNodes > 0) {
      assert(nNodes >= 4, s"$nNodes nodes cannot all have degree >= 3")
      assert(2 * nEdges >= 3 * nNodes, s"avg degree below K: $rows")
    } else assert(nEdges == 0)
  }

  test("q286 LPA == naive 4-round sync replay over the collected graph") {
    val mut = SimilarityQueries.mutualKnnEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (mut ++ mut.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val nodes = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"))
      .collect().map(_.getLong(0))
    var lab = nodes.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lab = nodes.map { n =>
        nbrs.get(n) match {
          case None => n -> lab(n)
          case Some(ns) =>
            val counts = ns.map(lab).groupBy(identity)
              .map { case (l, xs) => (l, xs.length) }
            // max frequency, min label on ties
            n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    val expect = lab.groupBy(_._2).map { case (c, ms) =>
      val ids = ms.keys.toSeq
      (c, ids.length.toLong, ids.min, ids.sum)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q286_lpa_communities")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
    // communities genuinely formed: fewer labels than nodes
    assert(got.length < nodes.length)
  }
}
