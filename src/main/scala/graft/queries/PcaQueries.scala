package graft.queries

import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding decorrelation statistics (SURVEY §2.3 similarity family).
  * No reference implementation; driver-mandated pipeline extensions: the
  * PCA passes a training-data pipeline runs before whitening, SemDeDup-
  * style semantic clustering, or dimensionality triage (the q268
  * matryoshka curve's informed cousin — WHICH directions carry
  * variance).
  *
  *  - q264: top principal component + explained-variance ratio.
  *  - q269: two-component PCA WHITENING — PC2 via matrix deflation
  *    (C₂ = C − λ₁v₁v₁ᵀ), then the unit-variance whitened coordinates
  *    of the query documents (the standard decorrelation transform
  *    before cosine/SemDeDup work at scale).
  *
  * Shared machinery, hash-exact across engines:
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
  *     the gates are full hash compares on raw doubles.
  *  4. Sign is fixed by the first |component| > 1e-9.
  *
  * PcaSpec replays both pipelines from scratch in plain Scala (exact
  * Long Gram matrix + the same fold orders) and checks eigen-residual
  * convergence, unit-variance whitening, and component orthogonality
  * on the fixture.
  */
object PcaQueries {

  private val Dim = SimilarityQueries.Dim
  private val Iters = 96
  // normalize every ChunkRounds rounds: the iterate shrinks by up to
  // (lambda1/trace)^k ~ 1e-28 per 16 scaled rounds, and the NORM-SQUARED
  // fold would underflow doubles past ~32 unnormalized rounds
  private val ChunkRounds = 16
  private val NumQueries = 5

  // ---- shared oracle fragments -----------------------------------------

  /** CTE chain (needs a leading WITH) ending in `base`: one row with
    * the covariance-numerator matrix `m` (DOUBLE[][]), the coordinate
    * sums `sarr` (BIGINT[]), and the row count `nn`. */
  private def covCtes: String = covCtesWhere("")

  /** [[covCtes]] with an optional WHERE on the embeddings scan — the
    * q287 unlearning oracle recomputes directly over the RETAINED
    * set, which the engine side must match from partial subtraction. */
  private def covCtesWhere(whereSql: String): String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings $whereSql),
       |qz AS (SELECT vec_id, [CAST(floor(v[i]*100.0 + 0.5) AS BIGINT)
       |                      for i in generate_series(1, $Dim)] AS qv FROM e),
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
       |base0 AS MATERIALIZED (
       |  SELECT (SELECT list(r ORDER BY i) FROM rows_) AS m,
       |         (SELECT list(si ORDER BY i) FROM sums) AS sarr,
       |         (SELECT any_value(n) FROM sums) AS nn),
       |base AS (
       |  SELECT m, sarr, nn,
       |         list_aggregate([m[i][i] for i in generate_series(1, $Dim)], 'sum') AS tr
       |  FROM base0)""".stripMargin

  /** Unrolled TRACE-SCALED power iteration over matrix column `mCol`
    * (spectral scale in column `scaleCol`), starting from CTE `from`
    * (carrying every column in `carry`), producing CTE `outName` with
    * the final sign-fixed unit vector as `vCol`. Dividing by the trace
    * bounds the spectral radius in (0, 1], so no per-round
    * normalization is needed: lambda1/trace >= 1/d, hence the iterate\'s
    * norm after $Iters rounds stays >= (1/64)^96 ~ 1e-173 — far above
    * double underflow — and ONE matvec per round is the whole cost.
    * Normalization and the sign fix happen once at the end. */
  private def iterCtes(mCol: String, scaleCol: String, from: String,
      carry: Seq[String], prefix: String, outName: String,
      vCol: String): String = {
    val keep = (carry ++ Seq(mCol, scaleCol)).mkString(", ")
    val first =
      s"""${prefix}0 AS (SELECT $keep,
         |  [CAST(0.125 AS DOUBLE) for z in generate_series(1, $Dim)] AS $vCol
         |  FROM $from)""".stripMargin
    var prev = s"${prefix}0"
    val rounds = (1 to Iters).map { k =>
      val matv =
        s"""$prefix$k AS MATERIALIZED (
           |  SELECT $keep, [list_aggregate([($mCol[i][j]/$scaleCol)*$vCol[j]
           |      for j in generate_series(1, $Dim)], 'sum')
           |    for i in generate_series(1, $Dim)] AS $vCol
           |  FROM $prev)""".stripMargin
      prev = s"$prefix$k"
      if (k % ChunkRounds != 0) matv
      else {
        val norm =
          s"""${prefix}n$k AS MATERIALIZED (
             |  SELECT $keep,
             |         [x / sqrt(list_aggregate([y*y for y in $vCol], 'sum'))
             |          for x in $vCol] AS $vCol
             |  FROM $prev)""".stripMargin
        prev = s"${prefix}n$k"
        s"$matv,\n$norm"
      }
    }.mkString(",\n")
    val last = prev
    s"""$first,
       |$rounds,
       |${outName}_n AS MATERIALIZED (
       |  SELECT $keep,
       |         [x / sqrt(list_aggregate([y*y for y in $vCol], 'sum'))
       |          for x in $vCol] AS $vCol
       |  FROM $last),
       |$outName AS (
       |  SELECT $keep,
       |         [CASE WHEN ([x for x in $vCol if abs(x) > 1e-9])[1] < 0
       |               THEN -$vCol[i] ELSE $vCol[i] END
       |          for i in generate_series(1, $Dim)] AS $vCol
       |  FROM ${outName}_n)""".stripMargin
  }

  /** Rayleigh quotient vᵀMv as an oracle expression (v unit). */
  private def raySql(mCol: String, vCol: String): String =
    s"""list_aggregate([$vCol[i] * list_aggregate([$mCol[i][j]*$vCol[j]
       |    for j in generate_series(1, $Dim)], 'sum')
       |  for i in generate_series(1, $Dim)], 'sum')""".stripMargin

  // ---- shared Spark-side builders ---------------------------------------

  /** One-row frame: covariance-numerator matrix `m`, coordinate sums
    * `sarr`, row count `nn`. The only corpus-wide stage of every PCA
    * gate — everything downstream operates on this single row. */
  private[queries] def covFrame(spark: SparkSession, dir: String): DataFrame = {
    val qz = quantized(spark, dir)
    // ONE aggregate pass: gram_sums packs [n, S, upper-tri G] into a
    // single exact-integer array (tight primitive loop per row, element-
    // wise-merged partials — no per-row cell explosion, the exchange is
    // one array per map partition); unpackCov derives the covariance
    // matrix on the 1-row frame (flat index of G(i,j), i<=j, is
    // 1 + d + (i-1)(d+1) - i(i-1)/2 + (j-i+1)).
    unpackCov(
      qz.agg(graft.functions.GraftFunctions.gram_sums(col("qv"), Dim).as("gs")))
  }

  /** Quantized corpus: (vec_id, qv ARRAY<BIGINT>) — the shared input
    * of every scatter pass. */
  private[queries] def quantized(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"),
        expr("transform(CAST(embedding AS array<double>), x -> " +
          "CAST(floor(x*100.0 + 0.5) AS BIGINT))").as("qv"))
  }

  /** Unpack a 1-row frame carrying a `gs` gram_sums array into the
    * (m, sarr, nn, tr) covariance frame every PCA gate consumes. */
  private[queries] def unpackCov(gsDf: DataFrame): DataFrame = {
    val gi = s"""1 + $Dim + (least(i, j) - 1) * ${Dim + 1}
                | - ((least(i, j) - 1) * least(i, j)) DIV 2
                | + (greatest(i, j) - least(i, j) + 1)""".stripMargin
      .replace("\n", "")
    gsDf
      .select(
        expr(
          s"""transform(sequence(1, $Dim), i -> transform(sequence(1, $Dim), j ->
             |  CAST(element_at(gs, 1) * element_at(gs, CAST($gi AS INT))
             |       - element_at(gs, CAST(i + 1 AS INT))
             |         * element_at(gs, CAST(j + 1 AS INT)) AS DOUBLE)))"""
            .stripMargin).as("m"),
        expr(s"slice(gs, 2, $Dim)").as("sarr"),
        expr("element_at(gs, 1)").as("nn"))
      .withColumn("tr", expr(
        s"""aggregate(transform(sequence(1, $Dim), i ->
           |  element_at(element_at(m, i), i)), 0D, (a, y) -> a + y)"""
          .stripMargin))
  }

  /** All 24 normalized power-iteration rounds + the sign fix inside ONE
    * expression over matrix column `mCol` (no per-round checkpoint, no
    * lineage growth; the norm's matvec recompute is 64×64 doubles on
    * one row). */
  /** One chunk of ChunkRounds trace-scaled matvec rounds folded inside
    * a single expression over the vector column `vCol`. */
  private def chunkExpr(mCol: String, scaleCol: String, vCol: String): String =
    s"""aggregate(sequence(1, $ChunkRounds), $vCol,
       |  (acc, it) -> transform(sequence(1, $Dim), i ->
       |    aggregate(sequence(1, $Dim), 0D,
       |      (s, j) -> s + (element_at(element_at($mCol, i), j) / $scaleCol)
       |                    * element_at(acc, j))))""".stripMargin

  private def normExpr(vCol: String): String =
    s"transform($vCol, x -> x / sqrt(aggregate($vCol, 0D, (a, y) -> a + y*y)))"

  /** Adds `vName` = sign-fixed unit eigenvector of `mCol` (trace-scaled
    * iteration, see iterCtes): Iters/ChunkRounds chunks, each one
    * in-expression fold of ChunkRounds matvecs followed by a
    * normalization, CHECKPOINTED per chunk — the normalization (and
    * the final sign fix) reference the vector twice, and an inlined
    * recompute would re-run the whole fold per element. */
  private def withEigvec(df: DataFrame, mCol: String, scaleCol: String,
      vName: String): DataFrame = {
    var cur = FrameMemo.checkpointed(df.withColumn(vName,
      expr(s"transform(sequence(1, $Dim), z -> CAST(0.125 AS DOUBLE))")))
    for (_ <- 1 to Iters / ChunkRounds) {
      cur = FrameMemo.checkpointed(
        cur.withColumn("__vc", expr(chunkExpr(mCol, scaleCol, vName)))
          .withColumn(vName, expr(normExpr("__vc")))
          .drop("__vc"))
    }
    // mirror the oracle's final-normalize-then-sign-fix exactly (the
    // last chunk already normalized; renormalizing a unit vector is a
    // deterministic no-op-sized perturbation both engines share)
    cur.withColumn("__vn", expr(normExpr(vName)))
      .withColumn(vName, expr(
        s"""transform(__vn, u -> IF(
           |  element_at(filter(__vn, x -> abs(x) > 1e-9), 1) < 0,
           |  -u, u))""".stripMargin))
      .drop("__vn")
  }

  /** Rayleigh quotient vᵀMv (v unit) as a Spark expression. */
  private def rayExpr(mCol: String, vCol: String): String =
    s"""aggregate(transform(sequence(1, $Dim), i ->
       |  element_at($vCol, i) * aggregate(sequence(1, $Dim), 0D,
       |    (s, j) -> s + element_at(element_at($mCol, i), j) * element_at($vCol, j))),
       |  0D, (a, y) -> a + y)""".stripMargin

  private lazy val pc1OracleSql: String = pc1OracleFor("")

  private def pc1OracleFor(whereSql: String): String =
    s"""WITH ${covCtesWhere(whereSql)},
       |${iterCtes("m", "tr", "base", Nil, "i", "fin", "v")},
       |ray AS (SELECT m, v, tr, ${raySql("m", "v")} AS lam FROM fin)
       |SELECT dim, val FROM (
       |  SELECT CAST(i AS BIGINT) AS dim, v[i] AS val
       |  FROM ray, generate_series(1, $Dim) t(i)
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT) AS dim, lam / tr AS val FROM ray) u
       |ORDER BY dim""".stripMargin

  /** PC1 loadings + the dim = -1 explained-variance summary row from a
    * covariance frame — the shared tail of q264 and q276. */
  private def pc1Out(cov: DataFrame): DataFrame = {
    val fin = withEigvec(cov, "m", "tr", "v")
      .withColumn("lam", expr(rayExpr("m", "v")))
    val load = fin.select(posexplode(col("v")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x").as("val"))
    val summary = fin.select(lit(-1L).as("dim"),
      (col("lam") / col("tr")).as("val"))
    load.unionByName(summary).orderBy("dim")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q264_pca_power", pc1OracleSql) { (spark, dir) =>
      pc1Out(covFrame(spark, dir))
    },

    // INCREMENTAL PCA MAINTENANCE: the gram_sums summary is exactly
    // partial-aggregation-shaped, so a maintained scatter artifact
    // folds a delta batch by ELEMENT-WISE ADDITION — this gate splits
    // the corpus into a "base" (even vec_id) and a "delta" (odd),
    // aggregates each separately, zip_with-merges the two integer
    // arrays, and runs the identical downstream. The oracle is q264's
    // whole-corpus text verbatim: incremental == batch to the BYTE, or
    // the hash fails — the same maintenance contract as the q245/q260
    // materialized-view algebra, applied to the decomposition family.
    QueryDef("q276_pca_incremental", pc1OracleSql) { (spark, dir) =>
      val qz = quantized(spark, dir)
      val gsum = graft.functions.GraftFunctions.gram_sums(col("qv"), Dim)
      val base = qz.where(col("vec_id") % 2 === 0).agg(gsum.as("gsa"))
      val delta = qz.where(col("vec_id") % 2 =!= 0).agg(gsum.as("gsb"))
      val merged = base.crossJoin(delta)
        .select(expr("zip_with(gsa, gsb, (a, b) -> a + b)").as("gs"))
      pc1Out(unpackCov(merged))
    },

    // EXACT UNLEARNING (the GDPR/right-to-be-forgotten path, q276's
    // inverse): delete vec_id % 5 = 0 from the decomposition WITHOUT
    // rescanning what remains — whole-corpus gram_sums partials (the
    // "stored" state) MINUS the delete-set's partials, zip_with
    // subtraction on exact integers, identical downstream chain. The
    // oracle recomputes DIRECTLY over the retained set, so
    // subtraction == recomputation to the byte or the hash fails. At
    // 100 TB the engine side scans only the deleted rows; the q245/
    // q260/q276 maintenance algebra run in reverse.
    QueryDef("q287_pca_unlearning",
      pc1OracleFor("WHERE vec_id % 5 <> 0")) { (spark, dir) =>
      val qz = quantized(spark, dir)
      val gsum = graft.functions.GraftFunctions.gram_sums(col("qv"), Dim)
      val whole = qz.agg(gsum.as("gsa"))
      val deleted = qz.where(col("vec_id") % 5 === 0).agg(gsum.as("gsb"))
      val retained = whole.crossJoin(deleted)
        .select(expr("zip_with(gsa, gsb, (a, b) -> a - b)").as("gs"))
      pc1Out(unpackCov(retained))
    },

    // TWO-COMPONENT PCA WHITENING: PC1 by power iteration, λ₁ by
    // Rayleigh, PC2 by iterating the DEFLATED matrix C₂ = C − λ₁v₁v₁ᵀ
    // (Hotelling deflation), then each query document's whitened
    // coordinates wₖ = n·(q − S/n)·vₖ / √λₖ — unit variance along each
    // component by construction (C is the n²-scaled covariance, so the
    // projection variance is λₖ/n²). The corpus contributes only the
    // O(d²) scatter pass shared with q264; the projection joins the
    // 5-doc query frame against the one-row stats frame.
    QueryDef("q269_pca_whiten", {
      val proj = (k: Int) =>
        s"""nn * list_aggregate([(qv[i] - CAST(sarr[i] AS DOUBLE)/nn) * v$k[i]
           |    for i in generate_series(1, $Dim)], 'sum') / sqrt(lam$k)"""
          .stripMargin
      s"""WITH $covCtes,
         |${iterCtes("m", "tr", "base", Seq("sarr", "nn"), "a", "fin1", "v1")},
         |d1 AS (SELECT m, tr, sarr, nn, v1, ${raySql("m", "v1")} AS lam1 FROM fin1),
         |defl AS MATERIALIZED (
         |  SELECT sarr, nn, v1, lam1,
         |         [[m[i][j] - lam1 * v1[i] * v1[j]
         |           for j in generate_series(1, $Dim)]
         |          for i in generate_series(1, $Dim)] AS m2,
         |         tr - lam1 AS tr2
         |  FROM d1),
         |${iterCtes("m2", "tr2", "defl", Seq("sarr", "nn", "v1", "lam1"), "b", "fin2", "v2")},
         |d2 AS (SELECT sarr, nn, v1, lam1, v2,
         |              ${raySql("m2", "v2")} AS lam2
         |       FROM fin2),
         |qd AS (SELECT vec_id, qv FROM qz WHERE vec_id < $NumQueries)
         |SELECT vec_id, ${proj(1)} AS w1, ${proj(2)} AS w2
         |FROM qd, d2 ORDER BY vec_id""".stripMargin
    }) { (spark, dir) =>
      val base = covFrame(spark, dir)
      val fin1 = withEigvec(base, "m", "tr", "v1")
        .withColumn("lam1", expr(rayExpr("m", "v1")))
      val defl = FrameMemo.checkpointed(fin1.withColumn("m2", expr(
        s"""transform(sequence(1, $Dim), i ->
           |  transform(sequence(1, $Dim), j ->
           |    element_at(element_at(m, i), j)
           |      - lam1 * element_at(v1, i) * element_at(v1, j)))"""
          .stripMargin))
        .withColumn("tr2", col("tr") - col("lam1")))
      val d2 = withEigvec(defl, "m2", "tr2", "v2")
        .withColumn("lam2", expr(rayExpr("m2", "v2")))
        .select("sarr", "nn", "v1", "lam1", "v2", "lam2")
      val qd = Tables.load(spark, dir, "embeddings")
        .where(col("vec_id") < NumQueries)
        .select(col("vec_id"),
          expr("transform(CAST(embedding AS array<double>), x -> " +
            "CAST(floor(x*100.0 + 0.5) AS BIGINT))").as("qv"))
      val proj = (k: Int) =>
        expr(s"""nn * aggregate(sequence(1, $Dim), 0D, (s, i) ->
                |  s + (element_at(qv, i) - CAST(element_at(sarr, i) AS DOUBLE)/nn)
                |      * element_at(v$k, i)) / sqrt(lam$k)""".stripMargin)
      qd.crossJoin(broadcast(d2))
        .select(col("vec_id"), proj(1).as("w1"), proj(2).as("w2"))
        .orderBy("vec_id")
    }
  )
}
