package graft.queries

import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Embedding decorrelation statistics (SURVEY §2.3 similarity family).
  * No reference implementation; driver-mandated pipeline extension: the
  * PCA pass a training-data pipeline runs before whitening, SemDeDup-
  * style semantic clustering, or dimensionality triage (the q268
  * matryoshka curve's informed cousin — WHICH prefix dimensions carry
  * variance).
  *
  * q264 computes the top principal component of the embedding corpus
  * plus its explained-variance ratio, hash-exact across engines:
  *
  *  1. Quantize each coordinate to integer centi-units
  *     (`floor(x*100 + 0.5)` — floor(+0.5) sidesteps HALF_UP/HALF_EVEN
  *     divergence). Integer sums are ORDER-FREE, so the scatter matrix
  *     is bit-identical regardless of partitioning.
  *  2. One corpus pass emits the upper-triangle outer-product partials
  *     (d·(d+1)/2 = 2080 cells); a map-side-combined hash agg reduces
  *     them — the exchange is O(d²) cells per partition, NOT O(rows),
  *     which is the whole 100 TB story: a 1000-executor scan ships
  *     2080 longs per task no matter the corpus size.
  *  3. The 64×64 covariance numerator n·G − S·Sᵀ (still exact
  *     integers) folds into a single-row array<array<double>> matrix;
  *     24 power-iteration rounds run INSIDE one expression
  *     (`aggregate(sequence(1,24), v0, …)`), so the corpus never
  *     re-enters and the lineage stays one projection deep. Every
  *     double op after the integer matrix is an identical-order fold
  *     on both engines (the repo-wide left-to-right convention), so
  *     the gate is a full hash compare on raw doubles.
  *  4. Sign is fixed by the first |component| > 1e-9; the summary row
  *     (dim = -1) carries λ / trace(C), the explained-variance ratio.
  *
  * PcaSpec replays the whole pipeline from scratch in plain Scala
  * (exact Long Gram matrix + the same fold orders) and checks the
  * eigen-residual ‖Cv − λv‖ actually converged on the fixture.
  */
object PcaQueries {

  private val Dim = SimilarityQueries.Dim
  private val Iters = 24

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q264_pca_power", {
      val iters = (1 to Iters).map { k =>
        val prev = s"i${k - 1}"
        s"""w$k AS MATERIALIZED (
           |  SELECT m, [list_aggregate([m[i][j]*v[j] for j in generate_series(1, $Dim)], 'sum')
           |             for i in generate_series(1, $Dim)] AS w
           |  FROM $prev),
           |i$k AS MATERIALIZED (
           |  SELECT m, [x / sqrt(list_aggregate([y*y for y in w], 'sum')) for x in w] AS v
           |  FROM w$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
         |qz AS (SELECT [CAST(floor(v[i]*100.0 + 0.5) AS BIGINT)
         |               for i in generate_series(1, $Dim)] AS qv FROM e),
         |cells AS (
         |  SELECT i, j, CAST(sum(qv[i]*qv[j]) AS BIGINT) AS g
         |  FROM qz, generate_series(1, $Dim) ti(i), generate_series(1, $Dim) tj(j)
         |  WHERE j >= i GROUP BY i, j),
         |sums AS (
         |  SELECT i, CAST(sum(qv[i]) AS BIGINT) AS si, CAST(count(*) AS BIGINT) AS n
         |  FROM qz, generate_series(1, $Dim) ti(i) GROUP BY i),
         |gfull AS (SELECT i, j, g FROM cells
         |          UNION ALL SELECT j AS i, i AS j, g FROM cells WHERE i <> j),
         |cmat AS (
         |  SELECT gf.i AS i, gf.j AS j,
         |         CAST(a.n * gf.g - a.si * b.si AS DOUBLE) AS cij
         |  FROM gfull gf JOIN sums a ON a.i = gf.i JOIN sums b ON b.i = gf.j),
         |rows_ AS (SELECT i, list(cij ORDER BY j) AS r FROM cmat GROUP BY i),
         |i0 AS MATERIALIZED (
         |  SELECT (SELECT list(r ORDER BY i) FROM rows_) AS m,
         |         [CAST(0.125 AS DOUBLE) for z in generate_series(1, $Dim)] AS v),
         |$iters,
         |fin AS (SELECT m, v,
         |               CASE WHEN ([x for x in v if abs(x) > 1e-9])[1] < 0
         |                    THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS sgn
         |        FROM i$Iters),
         |ray AS (SELECT m, v, sgn,
         |               list_aggregate([v[i] * list_aggregate([m[i][j]*v[j]
         |                   for j in generate_series(1, $Dim)], 'sum')
         |                 for i in generate_series(1, $Dim)], 'sum') AS lam,
         |               list_aggregate([m[i][i] for i in generate_series(1, $Dim)], 'sum') AS tr
         |        FROM fin)
         |SELECT dim, val FROM (
         |  SELECT CAST(i AS BIGINT) AS dim, sgn * v[i] AS val
         |  FROM ray, generate_series(1, $Dim) t(i)
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT) AS dim, lam / tr AS val FROM ray) u
         |ORDER BY dim""".stripMargin
    }) { (spark, dir) =>
      val e = Tables.load(spark, dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("embedding").cast("array<double>").as("v"))
      val qz = e.select(
        expr("transform(v, x -> CAST(floor(x*100.0 + 0.5) AS BIGINT))").as("qv"))
      // upper-triangle outer-product partials: d(d+1)/2 cells, reduced by
      // a map-side-combined hash agg (the only corpus-wide stage)
      val cells = qz.select(explode(expr(
          s"""flatten(transform(sequence(1, $Dim), i ->
             |  transform(sequence(i, $Dim), j ->
             |    named_struct('i', i, 'j', j,
             |                 'p', element_at(qv, i) * element_at(qv, j)))))"""
            .stripMargin)).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
        .groupBy("i", "j").agg(sum("p").as("g"))
      val sums = qz.select(posexplode(col("qv")).as(Seq("pos", "x")))
        .select((col("pos") + 1).as("i"), col("x"))
        .groupBy("i").agg(sum("x").as("si"), count(lit(1)).as("n"))
      val gfull = cells.unionByName(cells.where(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("g")))
      val cmat = gfull
        .join(broadcast(sums.select(col("i"), col("si"), col("n"))), "i")
        .join(broadcast(sums.select(col("i").as("j"), col("si").as("sj"))), "j")
        .select(col("i"), col("j"),
          (col("n") * col("g") - col("si") * col("sj")).cast("double").as("cij"))
      val matRows = cmat.groupBy("i")
        .agg(array_sort(collect_list(struct(col("j"), col("cij")))).as("l"))
        .select(col("i"), expr("transform(l, s -> s.cij)").as("r"))
      val mat = matRows
        .agg(array_sort(collect_list(struct(col("i"), col("r")))).as("lm"))
        .select(expr("transform(lm, s -> s.r)").as("m"))
      // all 24 normalized power-iteration rounds inside ONE expression on
      // the single-row matrix frame (no per-round checkpoint, no lineage
      // growth; the norm's matvec recompute is 64x64 doubles on one row)
      val iterExpr =
        s"""aggregate(sequence(1, $Iters),
           |  transform(sequence(1, $Dim), z -> CAST(0.125 AS DOUBLE)),
           |  (acc, it) -> transform(
           |    transform(sequence(1, $Dim), i ->
           |      aggregate(sequence(1, $Dim), 0D,
           |        (s, j) -> s + element_at(element_at(m, i), j) * element_at(acc, j))),
           |    x -> x / sqrt(aggregate(
           |      transform(sequence(1, $Dim), i2 ->
           |        aggregate(sequence(1, $Dim), 0D,
           |          (s2, j2) -> s2 + element_at(element_at(m, i2), j2) * element_at(acc, j2))),
           |      0D, (a, y) -> a + y*y))))""".stripMargin
      val fin = mat.withColumn("v", expr(iterExpr))
        .withColumn("sgn", expr(
          "IF(element_at(filter(v, x -> abs(x) > 1e-9), 1) < 0, " +
            "CAST(-1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))"))
        .withColumn("lam", expr(
          s"""aggregate(transform(sequence(1, $Dim), i ->
             |  element_at(v, i) * aggregate(sequence(1, $Dim), 0D,
             |    (s, j) -> s + element_at(element_at(m, i), j) * element_at(v, j))),
             |  0D, (a, y) -> a + y)""".stripMargin))
        .withColumn("tr", expr(
          s"""aggregate(transform(sequence(1, $Dim), i ->
             |  element_at(element_at(m, i), i)), 0D, (a, y) -> a + y)"""
            .stripMargin))
      val load = fin.select(col("sgn"), posexplode(col("v")).as(Seq("pos", "x")))
        .select((col("pos") + 1).cast("long").as("dim"),
          (col("sgn") * col("x")).as("val"))
      val summary = fin.select(lit(-1L).as("dim"),
        (col("lam") / col("tr")).as("val"))
      load.unionByName(summary).orderBy("dim")
    }
  )
}
