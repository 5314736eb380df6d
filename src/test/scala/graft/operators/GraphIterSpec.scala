package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The convergence contract the q231/q232 gates rely on: a graph
  * deeper than the old fixed 4-round unroll is walked/peeled to its
  * TRUE fixpoint, where the bounded form provably truncates. */
class GraphIterSpec extends SparkTestBase {

  import spark.implicits._

  /** Undirected chain 0-1-2-...-n, as directed both-way (id, nb). */
  private def chainEdges(n: Int) =
    (0 until n).flatMap(i =>
      Seq((i.toLong, (i + 1).toLong), ((i + 1).toLong, i.toLong)))
      .toDF("id", "nb")

  test("BFS walks an 11-hop chain exactly; a 4-level unroll would truncate it") {
    val edges = chainEdges(11) // diameter 11 > the old BfsRounds = 4
    val seeds = Seq(0L).toDF("id")
    val dist = GraphIter.bfsDistances(seeds, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == (0 to 11).map(i => i.toLong -> i.toLong).toMap)
    // the bounded form reaches only hops 0..4 — 7 nodes silently missing
    assert(dist.count(_._2 > 4) == 7)
  }

  test("BFS terminates on cycles (anti-join empties the frontier)") {
    val cyc = (0 until 6).flatMap { i =>
      val j = (i + 1) % 6
      Seq((i.toLong, j.toLong), (j.toLong, i.toLong))
    }.toDF("id", "nb")
    val dist = GraphIter.bfsDistances(Seq(0L).toDF("id"), cyc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(0L -> 0L, 1L -> 1L, 5L -> 1L, 2L -> 2L,
      4L -> 2L, 3L -> 3L))
  }

  test("k-core peels a 13-node chain to empty in 7 rounds (> the old 4-round unroll)") {
    // chain of 13 nodes: the 2-core is empty, but each peel round
    // only removes the two endpoints (then the last node once its
    // edges vanish) — 7 rounds to drain, so a 4-round unroll would
    // stop with 5 nodes still standing
    val e = (0 until 12).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val (keep, eFix, rounds) = GraphIter.kcoreFixpoint(e, k = 2)
    assert(keep.count() == 0 && eFix.count() == 0)
    assert(rounds == 7, s"expected 7 peel rounds, got $rounds")
  }

  test("k-core keeps a cycle and sheds its tail; an already-core graph converges in 1 round") {
    // 5-cycle (a genuine 2-core) with a 3-node pendant tail
    val cycle = (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong))
    val tail = Seq((0L, 10L), (10L, 11L), (11L, 12L))
    val (keep, eFix, rounds) =
      GraphIter.kcoreFixpoint((cycle ++ tail).toDF("a", "b"), k = 2)
    assert(keep.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    assert(eFix.count() == 5)
    assert(rounds == 3, s"tail drains one node per round: got $rounds")

    val (k2, e2, r2) = GraphIter.kcoreFixpoint(cycle.toDF("a", "b"), k = 2)
    assert(k2.count() == 5 && e2.count() == 5 && r2 == 1)
  }
}
