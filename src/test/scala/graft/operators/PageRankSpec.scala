package graft.operators

import graft.SparkTestBase

/** Semantics pins for integer PageRank: exact hand-derived values on
  * tiny graphs, isolated-node teleport floor, and partitioning
  * invariance of the integer arithmetic. */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int) =
    PageRank.ranks(nodes.toDF("id"), edges.toDF("id", "nb"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("2-cycle holds at one unit; isolated node settles at the teleport term") {
    // A<->B swap full damped mass each round: 150000 + 850000 = 1000000
    val got = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(got(1L) == (1000000L, 1L))
    assert(got(2L) == (1000000L, 1L))
    assert(got(3L) == (150000L, 0L))
  }

  test("star graph: exact hand-derived one-iteration values") {
    // undirected hub 0 with spokes 1..4: deg(hub)=4, deg(spoke)=1
    val spokes = (1L to 4L)
    val edges = spokes.flatMap(s => Seq((0L, s), (s, 0L)))
    val got = run(0L +: spokes, edges, iters = 1)
    // hub: 150000 + 4 * (1000000*85) DIV (100*1)  = 3550000
    // spoke: 150000 + (1000000*85) DIV (100*4)    = 362500
    assert(got(0L) == (3550000L, 4L))
    spokes.foreach(s => assert(got(s) == (362500L, 1L)))
  }

  test("truncating division is exact (deg=3 witness)") {
    // node 0 -> {1,2,3}: contribution each = 85000000 DIV 300 = 283333
    val got = run(Seq(0L, 1L, 2L, 3L),
      Seq((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
    assert(got(1L)._1 == 150000L + 283333L)
  }

  test("identical ranks under the reliable-checkpoint opt-in") {
    // the durability conf must not change a single rank: same graph,
    // both materialization paths, bit-equal results
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L))
    val a = run(nodes, edges, iters = 3)
    val b = withConf(graft.queries.FrameMemo.ReliableKey -> "true") {
      run(nodes, edges, iters = 3)
    }
    assert(a == b)
  }

  test("personalized: teleport lands only on seeds; exact 2-iter chain values") {
    val ranks = PageRank.personalizedRanks(
      Seq(0L, 1L, 2L, 3L).toDF("id"),
      Seq((0L, 1L), (1L, 2L)).toDF("id", "nb"),
      Seq(0L).toDF("id"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: r(0)=150000, r(1)=(1000000·85)DIV100=850000, r(2)=0
    // iter2: r(0)=150000, r(1)=(150000·85)DIV100=127500,
    //        r(2)=(850000·85)DIV100=722500; isolated non-seed 3 = 0
    assert(ranks == Map(0L -> 150000L, 1L -> 127500L,
      2L -> 722500L, 3L -> 0L), ranks.toString)
  }

  test("ranks are partitioning-invariant") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * 13 + 5) % 60))).toDF("id", "nb")
    val a = PageRank.ranks(nodes, edges, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = PageRank.ranks(nodes.repartition(7), edges.repartition(5), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
