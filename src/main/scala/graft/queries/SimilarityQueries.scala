package graft.queries

import graft.functions.GraftFunctions
import graft.operators.{IndexStore, IvfIndex}
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.3):
  * exact brute-force cosine top-k as the baseline, and a
  * random-hyperplane LSH (SimHash-style) bucketed variant as the
  * scale path. No reference implementation; driver-mandated.
  *
  * All arithmetic is double-precision with a LEFT-TO-RIGHT fold over
  * the vector (Spark `aggregate` and DuckDB `list_aggregate 'sum'`
  * both fold sequentially), so the oracle compare is bit-exact —
  * float inputs widen exactly to double before any multiply.
  *
  * Design for 100 TB:
  *  - Brute force is the RIGHT baseline plan at scale when the query
  *    set is small: broadcast the k query vectors, scan the corpus
  *    once (no shuffle of the corpus), per-partition top-k then a
  *    k-row final merge. The per-query window below is that shape:
  *    the only shuffled rows are (query x corpus) scores, and AQE
  *    coalesces; for very large corpora replace the window with
  *    per-partition heaps via the same reservoir machinery.
  *  - The LSH variant buckets the corpus by an 8-bit hyperplane
  *    signature (pure per-row expression), then equi-joins query
  *    buckets — candidate sets shrink ~256x and the join never goes
  *    all-pairs. Hyperplane entries are deterministic Rademacher
  *    (+/-1) weights derived from md5, shared verbatim with the
  *    oracle SQL.
  */
object SimilarityQueries {

  private[queries] val Dim = 64
  private val NumPlanes = 8
  private val NumQueries = 5
  private val NumCentroids = 16
  private val TopK = 10

  // multi-table LSH near-dup (q48)
  private val NumTables = 4
  private val NumPlanted = 8
  private val PlantOffset = 1000L
  private val NearDupThreshold = 0.95

  /** The label-blocked demo threshold (q36) — shared with the q81
    * hybrid closure's embedding-edge rule so a tuning change cannot
    * fork the two gates. */
  private[queries] val BlockedNearDupThreshold = 0.4

  /** Deterministic Rademacher hyperplanes: sign of the first nibble of
    * md5("p:i"). Same constants are inlined into the oracle SQL. */
  private[queries] val Planes: Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumPlanes).map { p =>
      (0 until Dim).map { i =>
        val h = md.digest(s"$p:$i".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) < 8) 1 else -1
      }
    }
  }

  /** Independent hyperplane families for the multi-table LSH tables,
    * keyed md5("t:p:i") — disjoint from [[Planes]]' "p:i" family. */
  private[queries] val TablePlanes: Seq[Seq[Seq[Int]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumTables).map { t =>
      (0 until NumPlanes).map { p =>
        (0 until Dim).map { i =>
          val h = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
          if (((h(0) >> 4) & 0xf) < 8) 1 else -1
        }
      }
    }
  }

  // ---- Spark side ----------------------------------------------------

  private def vecD(c: Column): Column = c.cast("array<double>")

  /** Codegen'd sequential dot product (VecDotProduct) — the same
    * left-to-right summation as a HOF fold, bit-exact vs the oracle,
    * but a generated Java loop instead of per-element closure calls. */
  private def dot(a: Column, b: Column): Column = GraftFunctions.vec_dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** 8-bit hyperplane signature, e.g. "10110100". */
  private def planeSig(v: Column): Column = {
    val bits = Planes.map { plane =>
      val w = typedlit(plane.map(_.toDouble))
      when(dot(v, w) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  private def normed(df: DataFrame): DataFrame =
    df.select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Corpus side: the fixture is one parquet split — spread rows
    * across cores before the CPU-bound fold expressions (no-op
    * redistribution on a real multi-split corpus; output order is
    * imposed downstream). */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    normed(Tables.load(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism))

  /** Query side: built from its OWN scan so the vec_id predicate
    * pushes down to parquet — the broadcast never waits on the
    * corpus-wide shuffle or recomputes norms through it. */
  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    broadcast(normed(
      Tables.load(spark, dir, "embeddings").where(col("vec_id") < NumQueries))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm")))

  /** Shared ranking tail: per-query top-k by similarity with a
    * deterministic neighbor-id tie-break (Spark pushes a partial
    * WindowGroupLimit below the exchange — see PLANS.md). */
  private def topKBySim(sims: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .orderBy(col("qid"), col("rank"))
  }

  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = corpus(spark, dir)
    val sims = queriesDf(spark, dir).crossJoin(e)
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
    topKBySim(sims)
  }

  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = corpus(spark, dir).withColumn("sig", planeSig(col("v")))
    val q = broadcast(normed(
      Tables.load(spark, dir, "embeddings").where(col("vec_id") < NumQueries))
      .withColumn("sig", planeSig(col("v")))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("sig").as("qsig")))
    val sims = q.join(e, col("qsig") === col("sig"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
    topKBySim(sims)
  }

  /** Multi-probe LSH: each query probes its OWN bucket plus every
    * HAMMING-1 neighbor bucket (one plane's bit flipped) — the
    * standard recall remedy for hyperplane LSH: a near neighbor on the
    * wrong side of exactly one plane is recovered at the cost of
    * NumPlanes extra (still tiny) probe keys per query. The corpus
    * side is untouched — only the broadcast query set fans out 9x. */
  def lshMultiProbeTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = corpus(spark, dir).withColumn("sig", planeSig(col("v")))
    val flip = (sig: Column, i: Int) => concat(
      substring(sig, 1, i - 1),
      when(substring(sig, i, 1) === "1", "0").otherwise("1"),
      substring(sig, i + 1, NumPlanes - i))
    val probes = (sig: Column) =>
      array(sig +: (1 to NumPlanes).map(i => flip(sig, i)): _*)
    val q = broadcast(normed(
      Tables.load(spark, dir, "embeddings").where(col("vec_id") < NumQueries))
      .withColumn("sig", planeSig(col("v")))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        explode(probes(col("sig"))).as("psig")))
    // no dedup needed: the 9 probe keys are pairwise distinct and each
    // corpus row has exactly one sig, so (qid, nid) appears at most once
    val sims = q.join(e, col("psig") === col("sig"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
    topKBySim(sims)
  }

  /** IVF ANN with a real coarse quantizer: seed centroids (the first
    * NumCentroids vectors, deterministic) refined by [[IvfIndex]]'s
    * Lloyd iterations, each vector assigned to its max-cosine cell by
    * a PER-ROW ARGMAX FOLD over the broadcast centroid array — no
    * Exchange and no Window over the corpus; the probe is an equi-join
    * on cell id. The built index is PERSISTED as a parquet artifact
    * via [[graft.operators.IndexStore]] — probes (q35/q52/q80) scan
    * the artifact; the build cost is paid (and bench-timed) only by
    * the declared build query q00. */
  private val LloydIterations = 2
  private val NumProbes = 2

  private def embSource(dir: String): String = s"$dir/embeddings.parquet"

  /** Artifact names embed the build configuration: changing the
    * centroid count or Lloyd depth addresses a NEW artifact rather
    * than serving one built under the old parameters (IndexStore's
    * mtime freshness cannot see config changes). */
  private def centroidsArtifact(dir: String): String =
    IndexStore.artifactPath(dir, s"ivf_centroids_c${NumCentroids}_i$LloydIterations")
  private def indexArtifact(dir: String): String =
    IndexStore.artifactPath(dir, s"ivf_index_c${NumCentroids}_i$LloydIterations")

  private def buildCentroids(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val seeds = normed(
      Tables.load(spark, dir, "embeddings").where(col("vec_id") < NumCentroids))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    IvfIndex.refine(corpus(spark, dir), seeds, LloydIterations)
  }

  def ivfCentroids(spark: SparkSession, dir: String): DataFrame =
    IndexStore.readOrBuild(spark, centroidsArtifact(dir), embSource(dir)) {
      buildCentroids(spark, dir)
    }

  def ivfIndex(spark: SparkSession, dir: String): DataFrame =
    IndexStore.readOrBuild(spark, indexArtifact(dir), embSource(dir)) {
      IvfIndex.assignCells(corpus(spark, dir), ivfCentroids(spark, dir))
    }

  /** Force-rebuild both IVF artifacts and emit the refined centroid
    * coordinates — the declared build entry: correctness-gated against
    * the full 2-iteration Lloyd chain, and the ONLY query that pays
    * the build (probes read the persisted parquet). */
  def ivfBuild(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val cents = IndexStore.rebuild(spark, centroidsArtifact(dir)) {
      buildCentroids(spark, dir)
    }
    IndexStore.rebuild(spark, indexArtifact(dir)) {
      IvfIndex.assignCells(corpus(spark, dir), cents)
    }
    cents.select(col("cid"), posexplode(col("cv")).as(Seq("i0", "cval")))
      .select(col("cid"), (col("i0") + 1).cast("long").as("i"), col("cval"))
      .orderBy(col("cid"), col("i"))
  }

  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val assigned = ivfIndex(spark, dir)
    val q = broadcast(assigned.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cid").as("qcid")))
    val sims = q.join(assigned, col("qcid") === col("cid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
    topKBySim(sims)
  }

  /** IVF with nprobe=2: each query searches its own cell plus the
    * next-nearest — the standard recall knob for a vector split across
    * a cell boundary. The cell ranking window runs over the
    * BROADCAST-SMALL query x centroid frame (NumQueries x NumCentroids
    * rows), never the corpus; the probe stays an equi-join on cell id
    * and the probed cells are disjoint, so no (qid, nid) dedup is
    * needed. */
  /** Shared probe selection: rank every centroid per query (window
    * over the broadcast-small query x centroid frame only) and keep
    * the top NumProbes cells. The query frame must carry qid/qv/qnrm;
    * any EXTRA columns (e.g. the int8 form qv8) pass through — ONE
    * definition of the probe rule for both ANN paths, so a tie-break
    * or nprobe change cannot fork them. */
  private def probedCells(q: DataFrame, cents: DataFrame): DataFrame = {
    val keep = q.columns.map(col).toSeq :+ col("cid")
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("psim").desc, col("cid"))
    broadcast(q.crossJoin(cents)
      .select(keep :+
        cosine(col("qv"), col("cv"), col("qnrm"), col("cnrm")).as("psim"): _*)
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= NumProbes)
      .select(keep: _*))
  }

  def ivfTopKProbe(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val assigned = ivfIndex(spark, dir)
    val q = assigned.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val probes = probedCells(q, ivfCentroids(spark, dir))
    val sims = probes.join(assigned, Seq("cid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
    topKBySim(sims)
  }

  /** Quantized-scoring ANN — the PQ-style two-stage search pattern:
    * stage 1 scores IVF-probe candidates with INT8 dot products
    * (symmetric per-vector quantization, q59's scheme — exact BIGINT
    * arithmetic, so the shortlist is bit-reproducible), stage 2
    * re-ranks only the shortlist in double-precision cosine. At scale
    * stage 1 reads 64 bytes/vector instead of 512 and runs integer
    * multiplies — the memory-bandwidth win PQ exists for — while
    * stage 2 restores exact ranking on a per-query constant number of
    * rows. Shortlist 3x the final k: a near neighbor displaced past
    * rank 30 by int8 rounding would need ~25% relative score error,
    * far beyond the quantizer's worst case. */
  private val Int8Shortlist = 3 * TopK

  def int8RerankTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val q8 = ivfIndex(spark, dir)
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .where(col("mx") > 0)
      .withColumn("v8", transform(col("v"), x => floor(x * 127.0 / col("mx"))))
      .drop("mx")
    val q = q8.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("v8").as("qv8"))
    val probes = probedCells(q, ivfCentroids(spark, dir))
    val scored = probes.join(q8, Seq("cid"))
      .select(col("qid"), col("vec_id").as("nid"),
        col("qv"), col("qnrm"), col("v"), col("nrm"),
        aggregate(zip_with(col("qv8"), col("v8"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("iscore"))
    // the shortlist window runs per query over <= nprobe cells' rows,
    // never the corpus; ties break on neighbor id
    val wShort = Window.partitionBy(col("qid")).orderBy(col("iscore").desc, col("nid"))
    val shortlist = scored.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= Int8Shortlist)
    topKBySim(shortlist.select(col("qid"), col("nid"),
      cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim")))
  }

  /** Multi-table LSH embedding near-dup at a REAL threshold (0.95
    * cosine) — the scale path q36's label blocking only demos. The
    * fixture's vectors are near-orthogonal (max pairwise cosine 0.51),
    * so the corpus is AUGMENTED with deterministic planted near-dups:
    * for vec_id < NumPlanted, a copy at vec_id + PlantOffset with
    * every coordinate perturbed +/-0.1% (cosine vs the original
    * ~0.999998, replayable in SQL). Candidates come from NumTables
    * independent 8-plane hyperplane tables OR'd together (equi-join on
    * (table, signature) — never all-pairs); a pair split by one table
    * is caught by another (miss probability ~(1-0.965)^4 ~ 1.5e-6 at
    * this similarity). The ORACLE is brute force at the same
    * threshold, so the gate is a genuine RECALL check: if any table
    * layout dropped a planted pair, the row sets would differ. */
  def embeddingNearDupLsh(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val aug = FrameMemo.memoized(spark, s"emb_aug#$dir") {
      val planted = normed(
        Tables.load(spark, dir, "embeddings").where(col("vec_id") < NumPlanted)
          .select((col("vec_id") + PlantOffset).as("vec_id"),
            transform(vecD(col("embedding")), (x, i) =>
              x * (lit(1.0) + when(i % 2 === 0, -0.001).otherwise(0.001)))
              .as("embedding")))
      corpus(spark, dir).unionByName(planted)
    }
    val keyed = FrameMemo.memoized(spark, s"emb_lsh_keys#$dir") {
      aug.select(col("vec_id"),
        explode(array((0 until NumTables).map(t =>
          struct(lit(t).as("t"), tableSig(col("v"), t).as("sig"))): _*)).as("k"))
        .select(col("vec_id"), col("k.t").as("t"), col("k.sig").as("sig"))
    }
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val av = aug.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val bv = aug.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(av, "id_a").join(bv, "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .where(col("sim") >= NearDupThreshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  private def tableSig(v: Column, t: Int): Column =
    concat(TablePlanes(t).map { plane =>
      val w = typedlit(plane.map(_.toDouble))
      when(dot(v, w) >= 0, "1").otherwise("0")
    }: _*)

  // ---- DuckDB oracle -------------------------------------------------

  private val normedCte =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_aggregate([x*x for x in v], 'sum')) AS nrm FROM e)""".stripMargin

  private def planesSqlLit: String =
    Planes.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  private val sigSql =
    (1 to NumPlanes).map { p =>
      s"CASE WHEN list_aggregate([v[i] * (planes[$p][i])::DOUBLE " +
        s"for i in generate_series(1, ${Dim})], 'sum') >= 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")

  private val bruteSql =
    s"""$normedCte,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n WHERE vec_id < $NumQueries),
       |sims AS (
       |  SELECT qid, n.vec_id AS nid,
       |         list_aggregate([qv[i]*v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm * n.nrm) AS sim
       |  FROM q, n)
       |SELECT qid, nid, sim, rank FROM (
       |  SELECT qid, nid, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
       |  FROM sims) t
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  private val lshSql =
    s"""$normedCte,
       |pl AS (SELECT $planesSqlLit AS planes),
       |s AS (SELECT vec_id, v, nrm, $sigSql AS sig FROM n CROSS JOIN pl),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm, sig AS qsig FROM s WHERE vec_id < $NumQueries),
       |sims AS (
       |  SELECT qid, s.vec_id AS nid,
       |         list_aggregate([qv[i]*v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm * s.nrm) AS sim
       |  FROM q JOIN s ON q.qsig = s.sig)
       |SELECT qid, nid, sim, rank FROM (
       |  SELECT qid, nid, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
       |  FROM sims) t
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  // ---- declared queries ----------------------------------------------

  /** One IVF cell-assignment CTE: every vector to its max-cosine
    * centroid from `cents`, ties to the lowest cid (mirrors the Spark
    * fold's strict-greater replacement). The oracle may use the
    * crossJoin+window shape freely — only the Spark plan must scale. */
  private def ivfAssignSql(cents: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, v, nrm, cid FROM (
       |    SELECT n.vec_id, n.v, n.nrm, c.cid,
       |           row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |             list_aggregate([n.v[i]*c.cv[i] for i in generate_series(1, $Dim)], 'sum')
       |               / (n.nrm*c.cnrm) DESC, c.cid) AS rn
       |    FROM n CROSS JOIN $cents c) t WHERE rn = 1)"""

  /** One Lloyd update CTE: per-cell coordinate means over coordinates
    * quantized with floor(x * 2^20) — BIGINT sums are exact in any
    * aggregation order, which is what makes k-means oracle-checkable
    * (see [[graft.operators.IvfIndex]]). */
  private def ivfLloydSql(assigned: String, out: String): String =
    s"""${out}s AS (
       |  SELECT cid, i,
       |         CAST(sum(CAST(floor(v[i] * ${IvfIndex.Scale}) AS BIGINT)) AS BIGINT) AS sv,
       |         count(*)::BIGINT AS cnt
       |  FROM $assigned CROSS JOIN generate_series(1, $Dim) t(i)
       |  GROUP BY cid, i),
       |$out AS (
       |  SELECT cid, cv, sqrt(list_aggregate([x*x for x in cv], 'sum')) AS cnrm FROM (
       |    SELECT cid, list(sv::DOUBLE / (cnt::DOUBLE * ${IvfIndex.Scale}) ORDER BY i) AS cv
       |    FROM ${out}s GROUP BY cid) z)"""

  private val ivfSql =
    s"""$normedCte,
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $NumCentroids),
       |${ivfAssignSql("c0", "a0")},
       |${ivfLloydSql("a0", "c1")},
       |${ivfAssignSql("c1", "a1")},
       |${ivfLloydSql("a1", "c2")},
       |${ivfAssignSql("c2", "cell")},
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm, cid AS qcid FROM cell WHERE vec_id < $NumQueries),
       |sims AS (
       |  SELECT qid, cell.vec_id AS nid,
       |         list_aggregate([qv[i]*cell.v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm*cell.nrm) AS sim
       |  FROM q JOIN cell ON q.qcid = cell.cid)
       |SELECT qid, nid, sim, rank FROM (
       |  SELECT qid, nid, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
       |  FROM sims) t
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  /** Embedding-cosine near-dup with metadata BLOCKING: candidate pairs
    * come from an equi-join on `label` (entity-resolution blocking —
    * never an all-pairs product; at scale the blocking key must be
    * selective, else fall back to the hyperplane buckets of
    * [[lshTopK]]), then a cosine threshold filters. The fixture's
    * vectors are near-orthogonal, so the demo threshold is 0.4; the
    * production-threshold (~0.95) scale path is the multi-table LSH of
    * [[embeddingNearDupLsh]] (q48). */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = corpus(spark, dir)
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    val lbl = Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("label"))
    a.join(lbl.select(col("vec_id").as("id_a"), col("label").as("la")), "id_a")
      .join(b.join(lbl.select(col("vec_id").as("id_b"), col("label").as("lb")), "id_b"),
        col("la") === col("lb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("la").as("label"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .where(col("sim") >= BlockedNearDupThreshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val nearDupSql =
    s"""$normedCte,
       |l AS (SELECT vec_id, label FROM embeddings),
       |j AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, la.label AS label,
       |         list_aggregate([a.v[i]*b.v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (a.nrm*b.nrm) AS sim
       |  FROM n a JOIN l la ON a.vec_id = la.vec_id
       |       JOIN l lb ON la.label = lb.label
       |       JOIN n b ON b.vec_id = lb.vec_id AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, label, sim FROM j
       |WHERE sim >= $BlockedNearDupThreshold ORDER BY id_a, id_b""".stripMargin

  private val multiProbeSql = {
    val flips = (1 to NumPlanes).map { i =>
      s"substr(qsig, 1, ${i - 1}) || (CASE WHEN substr(qsig, $i, 1) = '1' THEN '0' ELSE '1' END) || substr(qsig, ${i + 1}, ${NumPlanes - i})"
    }.mkString(", ")
    s"""$normedCte,
       |pl AS (SELECT $planesSqlLit AS planes),
       |s AS (SELECT vec_id, v, nrm, $sigSql AS sig FROM n CROSS JOIN pl),
       |q0 AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm, sig AS qsig FROM s WHERE vec_id < $NumQueries),
       |q AS (SELECT qid, qv, qnrm, unnest([qsig, $flips]) AS psig FROM q0),
       |sims AS (
       |  SELECT qid, s.vec_id AS nid,
       |         list_aggregate([qv[i]*v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm * s.nrm) AS sim
       |  FROM q JOIN s ON q.psig = s.sig)
       |SELECT qid, nid, sim, rank FROM (
       |  SELECT qid, nid, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
       |  FROM sims) t
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
  }

  /** nprobe=2 oracle: same 2-iteration Lloyd chain, then each query
    * ranks ALL cells and searches its top two. */
  private val ivfProbeSql =
    s"""$normedCte,
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $NumCentroids),
       |${ivfAssignSql("c0", "a0")},
       |${ivfLloydSql("a0", "c1")},
       |${ivfAssignSql("c1", "a1")},
       |${ivfLloydSql("a1", "c2")},
       |${ivfAssignSql("c2", "cell")},
       |probe AS (
       |  SELECT qid, qv, qnrm, cid FROM (
       |    SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qnrm, c.cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_aggregate([q.v[i]*c.cv[i] for i in generate_series(1, $Dim)], 'sum')
       |               / (q.nrm*c.cnrm) DESC, c.cid) AS rn
       |    FROM n q CROSS JOIN c2 c WHERE q.vec_id < $NumQueries) t
       |  WHERE rn <= $NumProbes),
       |sims AS (
       |  SELECT qid, cell.vec_id AS nid,
       |         list_aggregate([qv[i]*cell.v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm*cell.nrm) AS sim
       |  FROM probe JOIN cell ON probe.cid = cell.cid)
       |SELECT qid, nid, sim, rank FROM (
       |  SELECT qid, nid, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
       |  FROM sims) t
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  /** Brute-force oracle for [[embeddingNearDupLsh]] — deliberately
    * NOT the LSH decomposition: equality of the row sets proves the
    * multi-table index recalled every above-threshold pair. */
  private val nearDupLshSql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id + $PlantOffset AS vec_id,
       |             [v[i] * (1 + CASE WHEN i % 2 = 1 THEN -0.001 ELSE 0.001 END)
       |              for i in generate_series(1, $Dim)] AS v
       |      FROM e WHERE vec_id < $NumPlanted),
       |a0 AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM p),
       |aug AS (SELECT vec_id, v,
       |               sqrt(list_aggregate([x*x for x in v], 'sum')) AS nrm FROM a0)
       |SELECT id_a, id_b, sim FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         list_aggregate([a.v[i]*b.v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (a.nrm*b.nrm) AS sim
       |  FROM aug a JOIN aug b ON a.vec_id < b.vec_id) t
       |WHERE sim >= $NearDupThreshold
       |ORDER BY id_a, id_b""".stripMargin

  /** q00 oracle: the refined (2-iteration Lloyd) centroid coordinates
    * — the same CTE chain the probe oracles embed, surfaced directly.
    * Quantized-integer sums make every coordinate an exact double. */
  private val ivfBuildSql =
    s"""$normedCte,
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $NumCentroids),
       |${ivfAssignSql("c0", "a0")},
       |${ivfLloydSql("a0", "c1")},
       |${ivfAssignSql("c1", "a1")},
       |${ivfLloydSql("a1", "c2")}
       |SELECT cid, i::BIGINT AS i, cv[i] AS cval
       |FROM c2 CROSS JOIN generate_series(1, $Dim) t(i)
       |ORDER BY cid, i""".stripMargin

  /** q80 oracle: the full Lloyd chain, then the SAME two-stage search
    * — int8 shortlist (exact integer scores) then double rerank. */
  private val int8RerankSql =
    s"""$normedCte,
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $NumCentroids),
       |${ivfAssignSql("c0", "a0")},
       |${ivfLloydSql("a0", "c1")},
       |${ivfAssignSql("c1", "a1")},
       |${ivfLloydSql("a1", "c2")},
       |${ivfAssignSql("c2", "cell")},
       |q8 AS (
       |  SELECT vec_id, v, nrm, cid,
       |         [CAST(floor(v[i] * 127.0 / mx) AS BIGINT)
       |          for i in generate_series(1, $Dim)] AS v8
       |  FROM (SELECT vec_id, v, nrm, cid,
       |               list_aggregate([abs(x) for x in v], 'max') AS mx
       |        FROM cell) t
       |  WHERE mx > 0),
       |probe AS (
       |  SELECT qid, qv, qnrm, qv8, cid FROM (
       |    SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qnrm, q.v8 AS qv8, c.cid,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             list_aggregate([q.v[i]*c.cv[i] for i in generate_series(1, $Dim)], 'sum')
       |               / (q.nrm*c.cnrm) DESC, c.cid) AS rn
       |    FROM q8 q CROSS JOIN c2 c WHERE q.vec_id < $NumQueries) t
       |  WHERE rn <= $NumProbes),
       |scored AS (
       |  SELECT probe.qid, s.vec_id AS nid, probe.qv, probe.qnrm, s.v, s.nrm,
       |         list_aggregate([probe.qv8[i]*s.v8[i]
       |                         for i in generate_series(1, $Dim)], 'sum') AS iscore
       |  FROM probe JOIN q8 s ON probe.cid = s.cid),
       |short AS (
       |  SELECT qid, nid, qv, qnrm, v, nrm FROM (
       |    SELECT qid, nid, qv, qnrm, v, nrm,
       |           row_number() OVER (PARTITION BY qid ORDER BY iscore DESC, nid) AS srn
       |    FROM scored) t
       |  WHERE srn <= $Int8Shortlist),
       |sims AS (
       |  SELECT qid, nid,
       |         list_aggregate([qv[i]*v[i] for i in generate_series(1, $Dim)], 'sum')
       |           / (qnrm*nrm) AS sim
       |  FROM short)
       |SELECT qid, nid, sim, rank FROM (
       |  SELECT qid, nid, sim,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
       |  FROM sims) t
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // Sorts FIRST in the bench's name-ordered run: the index build is
    // paid and timed here, once; q35/q52/q80 then scan the artifact.
    QueryDef("q00_ivf_build", ivfBuildSql)(ivfBuild),
    QueryDef("q80_ann_int8_rerank", int8RerankSql)(int8RerankTopK),
    QueryDef("q26_similarity_topk", bruteSql)(bruteForceTopK),
    QueryDef("q27_ann_lsh_topk", lshSql)(lshTopK),
    QueryDef("q35_ann_ivf_topk", ivfSql)(ivfTopK),
    QueryDef("q36_embedding_neardup", nearDupSql)(embeddingNearDup),
    QueryDef("q42_ann_multiprobe", multiProbeSql)(lshMultiProbeTopK),
    QueryDef("q48_embedding_neardup_lsh", nearDupLshSql)(embeddingNearDupLsh),
    QueryDef("q52_ann_ivf_nprobe", ivfProbeSql)(ivfTopKProbe),

    // Symmetric int8 vector quantization — the storage-compression
    // pass a 100 TB embedding corpus runs before indexing: per-vector
    // scale = max |x| / 127, every coordinate floored after scaling.
    // Pure per-row expressions, zero shuffle; both engines do the
    // identical double arithmetic so the quantized integers match
    // bit-for-bit. Emitted as exploded scalar rows for the gate.
    QueryDef("q59_embedding_quantize",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m AS (SELECT vec_id, v,
         |             list_aggregate([abs(x) for x in v], 'max') AS mx FROM e)
         |SELECT vec_id, i::BIGINT AS i, CAST(floor(v[i] * 127.0 / mx) AS BIGINT) AS qval
         |FROM m CROSS JOIN generate_series(1, $Dim) t(i)
         |WHERE mx > 0
         |ORDER BY vec_id, i""".stripMargin) { (spark, dir) =>
      val e = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), vecD(col("embedding")).as("v"))
        .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      e.where(col("mx") > 0)
        .select(col("vec_id"),
          posexplode(transform(col("v"),
            x => floor(x * 127.0 / col("mx")))).as(Seq("i0", "qval")))
        .select(col("vec_id"), (col("i0") + 1).cast("long").as("i"), col("qval"))
        .orderBy(col("vec_id"), col("i"))
    }
  )
}
