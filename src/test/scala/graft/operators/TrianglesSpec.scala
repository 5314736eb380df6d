package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Degree-ordered enumeration must count exactly what the id-ordered
  * gate counts — orientation changes the join fan-out, never the
  * triangles. */
class TrianglesSpec extends SparkTestBase {

  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("equality on the fixture mutual-kNN graph") {
    val mut = graft.queries.SimilarityQueries.mutualKnnEdges(spark, sf0001)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val byDeg = counts(Triangles.perNodeDegreeOrdered(mut))
    val byId = counts(Triangles.perNodeIdOrdered(mut))
    assert(byDeg.nonEmpty && byDeg == byId)
  }

  test("equality on a hub graph where id order degenerates") {
    // node 0 is a hub wired to everyone (worst case for id order:
    // every wedge pivots on the lowest id); triangles exist between
    // the hub and consecutive rim nodes, plus one rim clique
    val rim = (1 to 20).map(i => (0L, i.toLong))
    val ring = (1 until 20).map(i => (i.toLong, (i + 1).toLong))
    val clique = Seq((21L, 22L), (21L, 23L), (22L, 23L), (0L, 21L))
    val e = (rim ++ ring ++ clique).toDF("a", "b")
    val byDeg = counts(Triangles.perNodeDegreeOrdered(e))
    val byId = counts(Triangles.perNodeIdOrdered(e))
    assert(byDeg == byId, s"\ndeg: $byDeg\nid:  $byId")
    // hand count: hub 0 is in one triangle per ring edge = 19
    assert(byDeg(0L) == 19L)
    // rim clique {21,22,23}: one triangle each
    assert(byDeg(21L) >= 1 && byDeg(22L) == 1 && byDeg(23L) == 1)
  }

  test("a triangle-free graph yields nothing under both orientations") {
    val star = (1 to 8).map(i => (0L, i.toLong)).toDF("a", "b")
    assert(Triangles.perNodeDegreeOrdered(star).count() == 0)
    assert(Triangles.perNodeIdOrdered(star).count() == 0)
  }
}
