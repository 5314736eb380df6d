package graft.operators

import graft.SparkTestBase

/** Randomized cross-checks of the convergence-driven graph operators
  * against naive single-machine references — deterministic seeds, a
  * dozen random graphs each, covering shapes no hand fixture hits
  * (disconnected pieces, self-encounters via cycles, dense cores with
  * dangling trees). */
class GraphIterRandomSpec extends SparkTestBase {

  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, mExpected: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until mExpected).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
  }

  private def naiveBfs(edges: Seq[(Long, Long)], seeds: Set[Long]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = scala.collection.mutable.Map(seeds.toSeq.map(_ -> 0L): _*)
    var frontier = seeds
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
    }
    dist.toMap
  }

  private def naiveKcore(edges: Seq[(Long, Long)], k: Int): Set[Long] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = (es.map(_._1) ++ es.map(_._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.length != es.length
      es = next
    }
    (es.map(_._1) ++ es.map(_._2)).toSet
  }

  test("BFS distances match a naive reference on 12 random graphs") {
    for (seed <- 1 to 12) {
      val es = randomGraph(seed, n = 30, mExpected = 35)
      if (es.nonEmpty) {
        val seeds = Set(es.head._1)
        val edges = es.flatMap(e => Seq(e, e.swap)).toDF("id", "nb")
        val got = GraphIter.bfsDistances(seeds.toSeq.toDF("id"), edges)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == naiveBfs(es, seeds), s"seed $seed")
      }
    }
  }

  test("k-core node sets match a naive reference on 12 random graphs") {
    for (seed <- 101 to 112) {
      val es = randomGraph(seed, n = 24, mExpected = 40)
      if (es.nonEmpty) {
        val (keep, eFix, _) = GraphIter.kcoreFixpoint(es.toDF("a", "b"), k = 2)
        val expect = naiveKcore(es, 2)
        assert(keep.collect().map(_.getLong(0)).toSet == expect, s"seed $seed")
        val gotEdges = eFix.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(gotEdges == es.filter(e => expect(e._1) && expect(e._2)).toSet,
          s"seed $seed edges")
      }
    }
  }

  test("degree-ordered triangles match id-ordered on 8 random graphs") {
    for (seed <- 201 to 208) {
      val es = randomGraph(seed, n = 18, mExpected = 45)
      if (es.nonEmpty) {
        val df = es.toDF("a", "b")
        val byDeg = Triangles.perNodeDegreeOrdered(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val byId = Triangles.perNodeIdOrdered(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(byDeg == byId, s"seed $seed")
      }
    }
  }
}
