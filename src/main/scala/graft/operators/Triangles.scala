package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Degree-ordered triangle enumeration — the scale path the q208 gate
  * documents: orienting every undirected edge from its lower-(degree,
  * id) endpoint to its higher one bounds each wedge join's per-node
  * fan-out by the graph's ARBORICITY (Chiba–Nishizeki; the
  * orientation every distributed triangle system uses), where plain
  * id-ordering lets one low-id hub fan out to its full degree
  * squared. Same plan shape as the gate — two equi-joins, one
  * explode, one count agg — only the orientation key changes, and
  * per-node triangle counts are orientation-invariant (TrianglesSpec
  * pins equality against the id-ordered form, including on a hub
  * graph where the id order degenerates).
  *
  * Scale shape: one degree agg (map-side combined), one broadcast-or-
  * shuffle join to attach endpoint degrees, then the standard
  * wedge-close pair of equi-joins on node ids. Nothing driver-side.
  */
object Triangles {

  private def keyLt(d1: Column, n1: Column, d2: Column, n2: Column): Column =
    d1 < d2 || (d1 === d2 && n1 < n2)

  /** Per-node triangle counts (id, n_tri) over an undirected graph
    * given as single-direction edges (a, b). Each triangle is
    * enumerated exactly once from its lowest-(degree, id) corner and
    * credited to all three nodes. */
  def perNodeDegreeOrdered(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("dg"))
    // orient low-(deg, id) -> high-(deg, id); carry the dst's degree
    // so wedge pairs can be ordered by the same total order
    val o = und
      .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(keyLt(col("da"), col("a"), col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst"), col("db").as("dd")))
          .otherwise(
            struct(col("b").as("src"), col("a").as("dst"), col("da").as("dd")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dd").as("dd"))
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.src") === col("e2.src") &&
        keyLt(col("e1.dd"), col("e1.dst"), col("e2.dd"), col("e2.dst")))
      .join(o.as("e3"), col("e3.src") === col("e1.dst") &&
        col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** The gate's id-ordered enumeration (requires a < b in the input),
    * as a reference for the equality spec. */
  def perNodeIdOrdered(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }
}
