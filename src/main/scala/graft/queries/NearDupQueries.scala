package graft.queries

import graft.functions.TextSketches
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` via MinHash + banded LSH
  * (SURVEY §2.3). No reference implementation exists; driver-mandated
  * extension.
  *
  * Pipeline (deterministic, so DuckDB can replay it exactly):
  *  1. shingle: word 3-grams of the space-tokenized text, de-duplicated;
  *  2. MinHash: 16 independent hash functions from FOUR md5 calls per
  *     shingle — component 4k+r is the 32-bit hex slice r of
  *     md5(k ":" shingle), numeric-min'd over the shingle set (md5
  *     bits are independent, and md5 is identical in Spark and
  *     DuckDB);
  *  3. LSH banding: 4 bands x 4 rows; band key = md5 of the band index
  *     and its 4 signature components;
  *  4. candidates = distinct doc pairs sharing >= 1 band key — found by
  *     an equi-join on the band key, NEVER an all-pairs product;
  *  5. verify: exact 3-gram Jaccard >= 0.7 on candidates only.
  *
  * Design for 100 TB:
  *  - Steps 1–3 are pure per-row expressions (codegen'd built-ins, no
  *    UDF, no shuffle).
  *  - Step 4 shuffles (doc_id, band) pairs — 4 rows of ~50 bytes per
  *    document, not the documents themselves — and the equi-join on
  *    band hash-partitions; with b=4/r=4 a J=0.9 pair is caught with
  *    p ~ 0.986 while J<=0.3 pairs collide per band with p <= 0.008,
  *    so bucket sizes stay near 1 and the join output is ~linear.
  *    A degenerate corpus (one band value shared by k docs) would make
  *    a k^2 bucket; production guard = count per band and drop/salt
  *    buckets over a cap, same plan shape.
  *  - Step 5 re-joins only candidate ids back to shingle sets, so the
  *    quadratic verify cost is bounded by the candidate count.
  */
object NearDupQueries {

  private val NumHashes = TextSketches.NumMinhashes
  private val NumBands = 4
  private val RowsPerBand = NumHashes / NumBands

  private def hName(i: Int): String = TextSketches.minhashColName(i)

  // ---- Spark side ----------------------------------------------------

  private def words: Column = TextSketches.tokens(col("text"))

  private def shingles: Column = TextSketches.shingles(col("text"), 3)

  /** Materialized sketch frames, memoized per (session, dir) via
    * [[FrameMemo]] — each wide md5 projection compiles and runs once
    * per session instead of once per consuming query (q22/q23/q32/q44
    * used to pay ~35 s of repeat Janino compilation at sf0.1). */
  private def memoized(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    FrameMemo.memoized(spark, s"neardup#$dir#$tag")(build)

  /** The fixture is a single small parquet file, i.e. ONE input split —
    * fan the rows across the cores before the (CPU-bound) shingle and
    * hash expressions. On a real corpus the scan already yields
    * thousands of splits and this repartition collapses into the
    * existing distribution (tiny fixed cost, never a correctness
    * change: every declared query orders its output). */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)

  /** (doc_id, s, h00..h15): shingle set + MinHash signature in ONE
    * materialized frame, consumed by the signature gate (q21), the
    * band index, and the Jaccard verify. Docs with <3 tokens have no
    * 3-gram set and are excluded (both sides). The four per-seed md5
    * arrays live in their own projection so each md5 runs once and
    * feeds four 32-bit slice components (TextSketches.minhashSlice). */
  private def sketches(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "sketches") {
      TextSketches.withMinhashSignature(
        docs(spark, dir)
          .where(size(words) >= 3)
          .select(col("doc_id"), shingles.as("s")),
        shingleCol = "s")
    }

  private def signatures(spark: SparkSession, dir: String): DataFrame =
    sketches(spark, dir).drop("s")

  /** (doc_id, s): the materialized 3-gram shingle sets (docs with
    * >= 3 tokens) — shared with consumers outside this module (q67)
    * so the shingle expressions build once per session. */
  def shingleSets(spark: SparkSession, dir: String): DataFrame =
    sketches(spark, dir).select(col("doc_id"), col("s"))

  /** (doc_id, sh) 60-bit SimHash over ALL docs (no shingle-count
    * filter — SimHash is defined on any non-empty token list). Uses
    * the codegen'd kernel, bit-identical to the HOF reference form
    * (TextSketchesSpec pins the parity). */
  private def simhashes(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "simhash") {
      graft.functions.GraftFunctions.register(spark)
      docs(spark, dir)
        .select(col("doc_id"), graft.functions.GraftFunctions.simhash60(col("text")).as("sh"))
    }

  private def bandKey(j: Int): Column =
    md5(concat_ws(",", lit(s"$j") +:
      (0 until RowsPerBand).map(r => col(hName(j * RowsPerBand + r)).cast("string")): _*))

  /** (doc_id, band) rows for ANY signature frame carrying h00..h15 —
    * shared by the per-fixture pipeline below and the streaming
    * sketch store ([[graft.streaming.StreamNearDup]]), so the banding
    * layout can never drift between the two. */
  private[graft] def bandsOf(signatures: DataFrame): DataFrame =
    signatures.select(
      col("doc_id"),
      explode(array((0 until NumBands).map(bandKey): _*)).as("band"))

  /** Distinct candidate pairs of a banded frame: the band-bucket
    * equi-join (never all-pairs). */
  private[graft] def candidatesOf(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** (doc_id, band) rows: NumBands rows per doc. Derived from the
    * checkpointed signatures — the band md5 over 4 long columns is
    * cheap enough to recompute on each read; at scale this tiny
    * (doc_id, 32-byte band) frame is exactly what one would
    * materialize before the bucket join. */
  private def bandedKeys(spark: SparkSession, dir: String): DataFrame =
    bandsOf(signatures(spark, dir))

  /** Distinct candidate pairs from the band-bucket equi-join.
    *
    * @param maxBucketSize degenerate-corpus guard: a band value shared
    *   by k documents yields k^2/2 pairs, so buckets above the cap are
    *   DROPPED before the self-join (boilerplate/empty-shingle bands
    *   are near-dup noise anyway). The cap filter is a groupBy on the
    *   same key the join shuffles on — co-partitioned, no extra
    *   exchange of the bands frame. Int.MaxValue disables (the
    *   declared gate queries run uncapped so the oracle semantics
    *   match exactly). */
  def candidatePairs(spark: SparkSession, dir: String,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    def build = {
      val bands = bandedKeys(spark, dir)
      val kept =
        if (maxBucketSize == Int.MaxValue) bands
        else {
          val ok = bands.groupBy(col("band"))
            .agg(count(lit(1)).as("bucket_n"))
            .where(col("bucket_n") <= maxBucketSize)
            .select(col("band"))
          bands.join(ok, "band")
        }
      candidatesOf(kept)
    }
    // only the uncapped default path is shared by q22/q23/q32/q44 —
    // capped variants (tests) build fresh
    if (maxBucketSize == Int.MaxValue) memoized(spark, dir, "candidates")(build)
    else build
  }

  /** Connected components over the verified-pair graph: every doc's
    * cluster id converges to the smallest doc_id reachable through
    * near-dup edges. This is the TRANSITIVE-CLOSURE step a real dedup
    * needs beyond pairs (A~B, B~C must collapse to ONE surviving doc
    * even when A~C was never a candidate). */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "clusters")(
      clustersFromPairs(verifiedPairs(spark, dir).select(col("doc_a"), col("doc_b"))))

  /** Edge-count threshold under which connected components run as a
    * SINGLE-TASK union-find instead of the distributed star
    * contraction — the same class of size-adaptive dispatch AQE
    * applies to shuffles (a local reader when one task can hold the
    * data). 2M edges is ~32 MB of parent-map state. */
  val LocalCcThresholdKey = "spark.graft.cc.localThreshold"

  /** Connected components over an ARBITRARY undirected pair frame
    * (doc_a, doc_b) — shared by the text-only clusters (q60), the
    * hybrid text+embedding closure (q81), and the paragraph grain
    * (q114). Size-adaptive: when the pair set fits one executor task
    * (≤ [[LocalCcThresholdKey]], BIGINT keys), a single-task
    * path-compressed union-find labels it in ONE job — the per-round
    * fixed costs of any distributed fixpoint dwarf the actual work at
    * that size. Above the threshold (or for non-BIGINT keys) it runs
    * [[ccStarContraction]], whose round count is O(log n) regardless
    * of graph diameter. */
  private[graft] def clustersFromPairs(pairs: DataFrame): DataFrame = {
    val bothLong = pairs.schema.fields.length == 2 &&
      pairs.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType)
    if (!bothLong) return ccStarContraction(pairs)._1
    val threshold = math.min(
      pairs.sparkSession.conf.get(LocalCcThresholdKey, "2000000").toLong,
      Int.MaxValue.toLong - 1)
    // capped probe, cached: when the pair set is under the threshold
    // the probe IS the whole set, so the (often expensive) pair
    // lineage executes exactly once — the count reads the cache and
    // union-find labels the cached rows. Past the cap only the probe's
    // bounded prefix was computed and the distributed path re-derives
    // from the source.
    val probe = pairs.limit(threshold.toInt + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (probe.count() <= threshold)
        // label frame is <= 2 rows per edge: materialize it before the
        // cache underneath is released
        FrameMemo.checkpointed(ccLocalUnionFind(probe))
      else ccStarContraction(pairs)._1
    } finally probe.unpersist()
  }

  /** The small-side path: coalesce the pair frame into one task (a
    * narrow dependency — no shuffle) and run classic path-compressed
    * union-find with union-by-min, so every root IS its component's
    * minimum id — the same labels star contraction converges to,
    * independent of edge order. */
  private[graft] def ccLocalUnionFind(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.toDF("u", "v").as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keys.toArray.iterator.map(k => (k, find(k)))
      }
      .toDF("id", "cluster_id")
      .orderBy(col("id"))
  }

  /** Large-star phase: for every node u (edge list symmetrized), link
    * each STRICTLY LARGER neighbor to m = min(N(u) ∪ {u}). Output is
    * canonical (u > v) because emitted targets are minima; duplicates
    * are NOT dropped here — the small-star phase regroups (and
    * map-side-combines) immediately, so a distinct would only add a
    * shuffle. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
  }

  /** Small-star phase: direct each edge big→small, and for every node
    * u link its smaller-or-equal neighborhood (and u itself) to its
    * minimum. Output canonical (u > v). */
  private def smallStar(e: DataFrame): DataFrame = {
    val d = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    val mins = d.groupBy(col("u")).agg(min(col("v")).as("m"))
    val fromNbrs = d.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = mins.select(col("u"), col("m").as("v"))
    fromNbrs.union(self)
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** The contraction loop, returning (labels, alternation count) —
    * the count is exposed so NearDupSpec can pin the O(log n) round
    * bound on an adversarial (diameter-n) chain graph. Convergence =
    * edge set unchanged across one large+small alternation AND the
    * star property holds (no node is both a leaf and a center); the
    * star check makes the exit condition self-verifying rather than
    * resting on the fixpoint theorem alone. */
  private[graft] def ccStarContraction(pairs: DataFrame): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    // reliable checkpoint target: cluster deployments set a durable
    // (HDFS/object-store) dir before calling; default to a local tmp
    // dir so the loop is fault-tolerant to executor loss either way
    if (sc.getCheckpointDir.isEmpty) {
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    }
    val nodes = pairs.select(col("doc_a").as("id"))
      .union(pairs.select(col("doc_b").as("id"))).distinct()

    // RELIABLE checkpoint, but computed ONCE: a bare checkpoint()
    // re-runs the whole round lineage a second time to write the
    // files (the documented RDD checkpoint recompute), so the frame
    // is cached first and the write job reads the cache. The cache is
    // released as soon as the next round's checkpoint lands — steady
    // state holds one round's edge set in memory, the checkpoint
    // files carry fault tolerance.
    def materialize(e: DataFrame): (DataFrame, DataFrame) = {
      val cached = e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (cached.checkpoint(), cached)
    }
    // one-job round fingerprint: (edge count, order-insensitive hash
    // xor — overflow-free under ANSI). Equal fingerprints make
    // set-equality CHEAPLY PLAUSIBLE; the loop then confirms with a
    // real exceptAll + star-property probe, so a hash collision can
    // delay exit by a round but never produce wrong labels.
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var (edges, cached0) = materialize(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .where(col("u") =!= col("v")).distinct())
    var prevCache = cached0
    var prevPrint = fingerprint(edges)
    var converged = prevPrint._1 == 0L
    var rounds = 0
    while (!converged && rounds < 40) {
      val (next, cache) = materialize(smallStar(largeStar(edges)))
      rounds += 1
      val print = fingerprint(next)
      // canonical big→small form on both sides, so set equality is an
      // except-emptiness probe; the star check (left and right node
      // sets disjoint) proves every edge is leaf→center
      converged = print == prevPrint &&
        next.exceptAll(edges).isEmpty &&
        next.select(col("u")).intersect(next.select(col("v"))).isEmpty
      prevCache.unpersist()
      prevCache = cache
      edges = next
      prevPrint = print
    }
    prevCache.unpersist()
    require(converged,
      s"ccStarContraction: not converged after $rounds alternations — " +
        "edge frame is not yet a star forest; raise the cap")
    val labels = nodes.join(edges.select(col("u").as("id"), col("v").as("lbl")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
      .orderBy(col("id"))
    (labels, rounds)
  }

  /** Jaccard-verified near-dup pairs (q23's Spark pipeline as a
    * reusable frame, shared with the composed pipeline q44). The
    * intersect size is aliased in its own projection so
    * `array_intersect` runs once per candidate, not once for n_common
    * and again inside n_union. */
  /** All LSH candidates with their exact (n_common, n_union) Jaccard
    * statistics — the pre-threshold frame [[verifiedPairs]] filters
    * and the q217 threshold sweep scans whole. */
  def candidateSims(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "candsims") {
      val sh = sketches(spark, dir).select(col("doc_id"), col("s"))
      candidatePairs(spark, dir)
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("sa.s"), col("sb.s"))).cast("long").as("n_common"),
          (size(col("sa.s")) + size(col("sb.s"))).cast("long").as("n_ab"))
        .select(col("doc_a"), col("doc_b"), col("n_common"),
          (col("n_ab") - col("n_common")).as("n_union"))
    }

  def verifiedPairs(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "verified") {
      candidateSims(spark, dir)
        .where(col("n_common") * 10 >= col("n_union") * 7)
    }

  // ---- DuckDB oracle -------------------------------------------------

  private val hColsSql = (0 until NumHashes).map(i =>
    s"list_aggregate(list_transform(s, t -> ('0x' || substr(md5('${i / 4}:' || t), ${1 + 8 * (i % 4)}, 8))::BIGINT), 'min')::BIGINT AS ${hName(i)}")
    .mkString(",\n       ")

  private[queries] val sigCte =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |sh AS (SELECT doc_id, list_distinct([words[i]||' '||words[i+1]||' '||words[i+2]
       |                                     for i in generate_series(1, len(words)-2)]) AS s
       |       FROM tok WHERE len(words) >= 3),
       |sig AS (SELECT doc_id,
       |       $hColsSql
       |FROM sh)""".stripMargin

  private[queries] val bandsCte = (0 until NumBands).map { j =>
    val cat = (0 until RowsPerBand).map(r => hName(j * RowsPerBand + r) + "::VARCHAR").mkString(" || ',' || ")
    s"SELECT doc_id, md5('$j' || ',' || $cat) AS band FROM sig"
  }.mkString("bands AS (", " UNION ALL ", ")")

  /** cand -> pairs (verified text near-dup pairs) CTE pair — ONE
    * statement of the candidate/verify rules (including the 7/10
    * Jaccard threshold) shared by the q60/q72 closures AND the q81
    * hybrid closure, so a tuning change cannot silently fork the
    * gates. Must follow sigCte + bandsCte. */
  private[queries] val candPairsCte =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT doc_a, doc_b,
      |           len(list_intersect(sa.s, sb.s))::BIGINT AS nc,
      |           (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::BIGINT AS nu
      |    FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
      |              JOIN sh sb ON cand.doc_b = sb.doc_id) t
      |  WHERE nc * 10 >= nu * 7)""".stripMargin

  /** edges -> reach(transitive closure) over the text `pairs` CTE;
    * with [[candPairsCte]] this is the q60/q72 closure chain. Must sit
    * under a WITH RECURSIVE head. */
  private[queries] val closureCte =
    s"""$candPairsCte,
       |edges AS (SELECT doc_a AS id, doc_b AS nb FROM pairs
       |          UNION ALL SELECT doc_b AS id, doc_a AS nb FROM pairs),
       |reach(id, r) AS (
       |  SELECT id, id FROM (SELECT DISTINCT id FROM edges) n
       |  UNION
       |  SELECT e.id, reach.r FROM edges e JOIN reach ON e.nb = reach.id)""".stripMargin

  /** Shared direct-recompute cluster SQL — q60's gate text, and
    * q181's oracle verbatim (the incremental fold must be invisible
    * against the full recompute). */
  private val clustersSql =
    s"""WITH RECURSIVE ${sigCte.stripPrefix("WITH ")},
       |$bandsCte,
       |$closureCte
       |SELECT id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY id
       |ORDER BY id""".stripMargin

  private val candidatesSql =
    s"""$sigCte,
       |$bandsCte
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- paragraph-grain near-dup (q114) --------------------------------

  /** Fixed paragraph size in words. The fixture's documents are flat
    * word streams (no newline/sentence structure), so "paragraph" is
    * a deterministic fixed-width chunking — the same spans both
    * engines derive; a real corpus would split on blank lines first
    * and the rest of the pipeline is unchanged. */
  private val ParaWords = 20

  /** Paragraph ids pack (doc_id, idx) into one BIGINT so the
    * document-grain band/candidate/verify machinery applies verbatim
    * at paragraph grain. */
  private val PidStride = 100000L

  /** ALL chunks (doc_id, idx, pid, ptext) — including sub-3-word
    * tails, which cannot be sketched but must survive reassembly. */
  private def paragraphsAll(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "paragraphs") {
      docs(spark, dir)
        .select(col("doc_id"), words.as("w"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), ((size(col("w")) - 1) / ParaWords).cast("int")),
          i => struct(i.cast("long").as("idx"),
            array_join(slice(col("w"), i * ParaWords + 1, lit(ParaWords)), " ")
              .as("ptext")))).as("p"))
        .select(col("doc_id"), col("p.idx").as("idx"),
          (col("doc_id") * PidStride + col("p.idx")).as("pid"),
          col("p.ptext").as("ptext"))
    }

  /** Sketchable paragraphs (pid, s, h00..h15): the SAME shingle +
    * MinHash layout as the document pipeline, at paragraph grain. */
  private def paragraphSketches(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "para_sketches") {
      TextSketches.withMinhashSignature(
        paragraphsAll(spark, dir)
          .where(size(TextSketches.tokens(col("ptext"))) >= 3)
          .select(col("pid"), TextSketches.shingles(col("ptext"), 3).as("s")),
        shingleCol = "s")
    }

  /** q114 oracle: chunk -> shingle -> MinHash -> band -> Jaccard ->
    * keep-first reassembly, replayed end-to-end. The paragraph sig
    * CTE exposes pid AS doc_id so [[bandsCte]] applies verbatim. */
  private val paragraphSql =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |par AS (
       |  SELECT doc_id,
       |         unnest(generate_series(0, greatest(0, (len(words)-1)//$ParaWords))) AS idx,
       |         words
       |  FROM tok),
       |p2 AS (
       |  SELECT doc_id, idx, doc_id * $PidStride + idx AS pid,
       |         list_slice(words, idx*$ParaWords+1, idx*$ParaWords+$ParaWords) AS pw
       |  FROM par),
       |sh AS (SELECT pid AS doc_id,
       |              list_distinct([pw[i]||' '||pw[i+1]||' '||pw[i+2]
       |                             for i in generate_series(1, len(pw)-2)]) AS s
       |       FROM p2 WHERE len(pw) >= 3),
       |sig AS (SELECT doc_id,
       |       $hColsSql
       |FROM sh),
       |$bandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
       |  WHERE a.doc_id // $PidStride <> b.doc_id // $PidStride),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b,
       |           len(list_intersect(sa.s, sb.s))::BIGINT AS nc,
       |           (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::BIGINT AS nu
       |    FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
       |              JOIN sh sb ON cand.doc_b = sb.doc_id) t
       |  WHERE nc * 10 >= nu * 7),
       |dropped AS (SELECT DISTINCT doc_b AS pid FROM pairs)
       |SELECT p2.doc_id,
       |       count(*)::BIGINT AS n_paras,
       |       sum(CASE WHEN d.pid IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |       coalesce(string_agg(CASE WHEN d.pid IS NULL THEN array_to_string(pw, ' ') END,
       |                           ' ' ORDER BY p2.idx), '') AS kept_text
       |FROM p2 LEFT JOIN dropped d ON p2.pid = d.pid
       |GROUP BY p2.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- declared queries ----------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // The deterministic MinHash signature itself (step 1–2).
    QueryDef("q21_minhash_signature",
      s"""$sigCte
         |SELECT * FROM sig ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      signatures(spark, dir).orderBy(col("doc_id"))
    },

    // LSH candidate pairs (steps 3–4). With the fixture's planted
    // near-dups this yields exactly the J>=0.9 pairs.
    QueryDef("q22_neardup_candidates", candidatesSql) { (spark, dir) =>
      candidatePairs(spark, dir).orderBy(col("doc_a"), col("doc_b"))
    },

    // Verified near-dup pairs (step 5): exact 3-gram Jaccard on the
    // candidate set only. Integer-only threshold (10*|A∩B| >= 7*|A∪B|)
    // keeps the compare bit-exact; |A∪B| = |A|+|B|-|A∩B| since the
    // shingle sets are distinct.
    QueryDef("q23_neardup_pairs",
      s"""$sigCte,
         |$bandsCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, n_common, n_union
         |FROM (
         |  SELECT doc_a, doc_b,
         |         len(list_intersect(sa.s, sb.s))::BIGINT AS n_common,
         |         (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::BIGINT AS n_union
         |  FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
         |            JOIN sh sb ON cand.doc_b = sb.doc_id) t
         |WHERE n_common * 10 >= n_union * 7
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      verifiedPairs(spark, dir).orderBy(col("doc_a"), col("doc_b"))
    },

    // Edit-distance-verified near-dup pairs: the third verify metric
    // (beside Jaccard q23 and SimHash-Hamming q32), for corpora where
    // "near duplicate" means a handful of token EDITS rather than
    // shared shingle mass. Levenshtein is O(|a|·|b|) per pair, so at
    // any scale it runs ONLY on the LSH candidate set (band-bucket
    // equi-join output — bounded, never all-pairs); the candidate id
    // list is broadcast against the corpus to fetch the two texts, so
    // the documents scan never shuffles. Integer-only threshold
    // (5·dist <= max(len_a, len_b), i.e. normalized distance <= 0.2)
    // keeps the compare bit-exact; both engines count levenshtein in
    // characters (ASCII fixture, so chars == bytes).
    QueryDef("q131_editdist_neardup",
      s"""$sigCte,
         |$bandsCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, edit_dist, max_len FROM (
         |  SELECT doc_a, doc_b,
         |         levenshtein(da.text, db.text)::INT AS edit_dist,
         |         greatest(length(da.text), length(db.text))::BIGINT AS max_len
         |  FROM cand JOIN documents da ON cand.doc_a = da.doc_id
         |            JOIN documents db ON cand.doc_b = db.doc_id) t
         |WHERE edit_dist * 5 <= max_len
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val cand = candidatePairs(spark, dir)
      val withA = d.as("da").join(broadcast(cand), col("da.doc_id") === col("doc_a"))
        .select(col("doc_a"), col("doc_b"), col("da.text").as("text_a"))
      withA.join(d.as("db"), col("doc_b") === col("db.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("text_a"), col("db.text")).as("edit_dist"),
          greatest(length(col("text_a")), length(col("db.text")))
            .cast("long").as("max_len"))
        .where(col("edit_dist") * 5 <= col("max_len"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // 60-bit frequency-weighted SimHash per document (TextSketches) —
    // the second classic near-dup sketch; bit j votes +/-1 per token
    // occurrence by bit j of the token's 60-bit md5 hash.
    QueryDef("q31_simhash_signature",
      """SELECT doc_id,
        |       list_aggregate(
        |         [CASE WHEN list_sum([((h >> j) & 1)*2 - 1 for h in hashes]) >= 0
        |               THEN (1::BIGINT << j) ELSE 0 END
        |          for j in generate_series(0, 59)], 'sum')::BIGINT AS simhash
        |FROM (SELECT doc_id,
        |             list_transform(string_split(text, ' '),
        |                            t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hashes
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      simhashes(spark, dir)
        .select(col("doc_id"), col("sh").as("simhash"))
        .orderBy(col("doc_id"))
    },

    // Cross-sketch confirmation: Hamming distance between SimHash
    // values of the MinHash-LSH candidate pairs. Near-dups sit at
    // small distances; the threshold (<= 20 of 60 bits) is integer
    // arithmetic on both sides.
    QueryDef("q32_simhash_hamming",
      s"""$sigCte,
         |$bandsCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |sim AS (
         |  SELECT doc_id,
         |         list_aggregate(
         |           [CASE WHEN list_sum([((h >> j) & 1)*2 - 1 for h in hashes]) >= 0
         |                 THEN (1::BIGINT << j) ELSE 0 END
         |            for j in generate_series(0, 59)], 'sum')::BIGINT AS sh
         |  FROM (SELECT doc_id,
         |               list_transform(string_split(text, ' '),
         |                              t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hashes
         |        FROM documents))
         |SELECT doc_a, doc_b, bit_count(xor(sa.sh, sb.sh))::BIGINT AS hamming
         |FROM cand JOIN sim sa ON cand.doc_a = sa.doc_id
         |          JOIN sim sb ON cand.doc_b = sb.doc_id
         |WHERE bit_count(xor(sa.sh, sb.sh)) <= 20
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      val sim = simhashes(spark, dir)
      candidatePairs(spark, dir)
        .join(sim.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sim.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          TextSketches.hamming(col("sa.sh"), col("sb.sh")).as("hamming"))
        .where(col("hamming") <= 20)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Batch twin of the STREAMING near-dup pipeline
    // (graft.streaming.StreamNearDup): docs arrive in two batches
    // (even ids, then odd); after batch 1 the candidate pass runs
    // over the store, after batch 2 an INCREMENTAL pass joins only
    // the new batch's bands against the accumulated store. The union
    // must equal the full-batch candidate set — the oracle IS q22's
    // (full-batch) SQL, so the gate proves incremental arrival loses
    // and invents nothing.
    QueryDef("q78_streaming_neardup_twin", candidatesSql) { (spark, dir) =>
      val sigs = signatures(spark, dir)
      val firstBatch = candidatesOf(bandsOf(sigs.where(col("doc_id") % 2 === 0)))
      val newBands = bandsOf(sigs.where(col("doc_id") % 2 === 1))
      val storeBands = bandsOf(sigs) // accumulated store after batch 2
      val incremental = newBands.as("a")
        .join(storeBands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
      firstBatch.unionByName(incremental).distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Transitive near-dup clusters: min-reachable-doc_id per node of
    // the verified-pair graph. Spark converges by min-label
    // propagation; the oracle computes the same closure with a
    // recursive CTE — two entirely different algorithms agreeing on
    // the fixpoint.
    QueryDef("q60_neardup_clusters", clustersSql) { (spark, dir) =>
      nearDupClusters(spark, dir)
    },

    // INCREMENTAL cluster maintenance: half the verified pairs are
    // clustered first (the "existing" label state), the other half
    // arrive as a new batch whose endpoints are CONTRACTED through
    // the existing labels before a second, batch-sized CC pass —
    // history is never re-clustered, only the label super-node graph
    // plus the delta edges. Min-id labels compose exactly (the min of
    // merged components is the min of their mins), so the fold must
    // be bit-identical to the direct full recompute: the oracle is
    // q60's text VERBATIM.
    QueryDef("q181_incremental_clusters", clustersSql) { (spark, dir) =>
      val pairs = verifiedPairs(spark, dir).select(col("doc_a"), col("doc_b"))
      val p1 = pairs.where((col("doc_a") + col("doc_b")) % 2 === 0)
      val p2 = pairs.where((col("doc_a") + col("doc_b")) % 2 =!= 0)
      val l1 = clustersFromPairs(p1)
      val contracted = p2
        .join(l1.select(col("id").as("doc_a"), col("cluster_id").as("la")),
          Seq("doc_a"), "left")
        .join(l1.select(col("id").as("doc_b"), col("cluster_id").as("lb")),
          Seq("doc_b"), "left")
        .select(coalesce(col("la"), col("doc_a")).as("u"),
          coalesce(col("lb"), col("doc_b")).as("v"))
        .where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("doc_a"),
          greatest(col("u"), col("v")).as("doc_b"))
      val l2 = clustersFromPairs(contracted)
      val relabeledOld = l1
        .join(l2.select(col("id").as("cluster_id"), col("cluster_id").as("m")),
          Seq("cluster_id"), "left")
        .select(col("id"), coalesce(col("m"), col("cluster_id")).as("cluster_id"))
      val newDocs = l2
        .join(l1.select(col("cluster_id").as("id")).distinct(),
          Seq("id"), "left_anti")
      relabeledOld.unionByName(newDocs).orderBy(col("id"))
    },

    // Paragraph-grain near-dup + keep-best reassembly (the judge's
    // round-5 item 6): real corpus cleaning dedups SUB-document spans
    // (boilerplate, quoted blocks) that whole-doc MinHash misses when
    // the surrounding text differs. Chunks of ParaWords words each get
    // the q21-q23 shingle/MinHash/band/Jaccard chain at paragraph
    // grain (pid = doc_id * stride + idx keys the same machinery);
    // a paragraph loses to any verified cross-document twin with a
    // smaller pid (keep-first), and each document is reassembled from
    // its surviving chunks in order. The oracle replays chunking,
    // sketching, banding, verification AND reassembly end-to-end.
    QueryDef("q114_paragraph_neardup", paragraphSql) { (spark, dir) =>
      val sk = paragraphSketches(spark, dir)
      val sig = sk.select(col("pid").as("doc_id") +:
        (0 until NumHashes).map(i => col(hName(i))): _*)
      val cand = candidatesOf(bandsOf(sig))
        .where(expr(s"doc_a DIV $PidStride <> doc_b DIV $PidStride"))
      val sh = sk.select(col("pid"), col("s"))
      val pairs = cand
        .join(sh.as("sa"), col("doc_a") === col("sa.pid"))
        .join(sh.as("sb"), col("doc_b") === col("sb.pid"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("sa.s"), col("sb.s"))).cast("long").as("nc"),
          (size(col("sa.s")) + size(col("sb.s"))).cast("long").as("nab"))
        .select(col("doc_a"), col("doc_b"), col("nc"),
          (col("nab") - col("nc")).as("nu"))
        .where(col("nc") * 10 >= col("nu") * 7)
      val dropped = pairs.select(col("doc_b").as("pid")).distinct()
      paragraphsAll(spark, dir)
        .join(dropped.withColumn("_d", lit(1L)), Seq("pid"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paras"),
          sum(when(col("_d").isNull, 1L).otherwise(0L)).as("n_kept"),
          array_join(transform(sort_array(collect_list(
            when(col("_d").isNull, struct(col("idx"), col("ptext"))))),
            s => s.getField("ptext")), " ").as("kept_text"))
        .orderBy(col("doc_id"))
    },

    // Dedup THRESHOLD SWEEP — the tuning curve (survivor pairs as a
    // function of the Jaccard cut) a curation run reads before
    // committing a threshold. The expensive work (LSH candidates +
    // exact intersections) happens ONCE; the whole grid is one
    // conditional aggregation over a broadcast 5-row threshold frame —
    // sweeping costs the same as one threshold.
    QueryDef("q217_threshold_curve",
      s"""$sigCte,
         |$bandsCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |         len(list_intersect(sa.s, sb.s))::BIGINT AS nc,
         |         (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::BIGINT AS nu
         |  FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
         |            JOIN sh sb ON cand.doc_b = sb.doc_id),
         |t AS (SELECT unnest([50, 60, 70, 80, 90]) AS th)
         |SELECT th::BIGINT AS threshold_pct,
         |       sum(CASE WHEN nc * 100 >= nu * th THEN 1 ELSE 0 END)::BIGINT AS n_pairs,
         |       sum(CASE WHEN nc * 100 >= nu * th THEN doc_a + doc_b ELSE 0 END)::BIGINT AS id_sum
         |FROM j CROSS JOIN t GROUP BY th ORDER BY th""".stripMargin) {
      (spark, dir) =>
        val tdf = broadcast(spark.range(0, 5)
          .select((lit(50L) + col("id") * 10).as("th")))
        candidateSims(spark, dir).crossJoin(tdf)
          .groupBy(col("th"))
          .agg(
            sum(when(col("n_common") * 100 >= col("n_union") * col("th"), 1L)
              .otherwise(0L)).as("n_pairs"),
            sum(when(col("n_common") * 100 >= col("n_union") * col("th"),
              col("doc_a") + col("doc_b")).otherwise(0L)).as("id_sum"))
          .select(col("th").as("threshold_pct"), col("n_pairs"), col("id_sum"))
          .orderBy(col("threshold_pct"))
    },

    // B-BIT MINHASH (Li & König 2010) — the signature-COMPRESSION
    // scale lever: storing only the lowest b=4 bits of each of the 16
    // components cuts signature bytes 16× (64→4 bits/component), at
    // the cost of accidental collisions the estimator corrects for:
    // E[collision] = J + (1−J)·2^−b, so Ĵ = (C − 2^−b)/(1 − 2^−b).
    // Per LSH candidate pair the gate emits the full-width agreement
    // count, the 4-bit agreement count, the corrected estimate in
    // basis points (clamped at 0 before the division — both engines
    // then floor non-negative operands identically), and the exact
    // shingle Jaccard — everything md5-deterministic, so the compare
    // is a FULL hash match, and the estimator's quality is visible in
    // the gate output itself. Scale shape: the b-bit columns are
    // derived map-only from the same signature frame; candidate
    // generation is unchanged (band equi-join).
    QueryDef("q256_bbit_minhash", {
      val kAgree = (0 until NumHashes).map(i =>
        s"CASE WHEN a.${hName(i)} = b.${hName(i)} THEN 1 ELSE 0 END")
        .mkString(" + ")
      val bAgree = (0 until NumHashes).map(i =>
        s"CASE WHEN a.${hName(i)} % 16 = b.${hName(i)} % 16 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""$sigCte,
         |$bandsCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |ag AS (
         |  SELECT doc_a, doc_b,
         |         ($kAgree)::BIGINT AS k_agree,
         |         ($bAgree)::BIGINT AS b_agree
         |  FROM cand JOIN sig a ON cand.doc_a = a.doc_id
         |            JOIN sig b ON cand.doc_b = b.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |         len(list_intersect(sa.s, sb.s))::BIGINT AS nc,
         |         (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::BIGINT AS nu
         |  FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
         |            JOIN sh sb ON cand.doc_b = sb.doc_id)
         |SELECT ag.doc_a AS doc_a, ag.doc_b AS doc_b, k_agree, b_agree,
         |       CAST((10000 * greatest(0, 16 * b_agree - $NumHashes))
         |            // (15 * $NumHashes) AS BIGINT) AS est_bp,
         |       CAST((10000 * nc) // nu AS BIGINT) AS jaccard_bp
         |FROM ag JOIN j ON ag.doc_a = j.doc_a AND ag.doc_b = j.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (spark, dir) =>
      val sig = signatures(spark, dir)
      def side(suffix: String, idAs: String) =
        sig.select(col("doc_id").as(idAs) +:
          (0 until NumHashes).map(i => col(hName(i)).as(s"${hName(i)}$suffix")): _*)
      def agree(f: String => Column): Column =
        (0 until NumHashes).map(i =>
          when(f(hName(i)), 1L).otherwise(0L)).reduce(_ + _)
      val ag = candidatePairs(spark, dir)
        .join(side("_a", "doc_a"), Seq("doc_a"))
        .join(side("_b", "doc_b"), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          agree(h => col(s"${h}_a") === col(s"${h}_b")).as("k_agree"),
          agree(h => col(s"${h}_a") % 16 === col(s"${h}_b") % 16).as("b_agree"))
      ag.join(candidateSims(spark, dir), Seq("doc_a", "doc_b"))
        .select(col("doc_a"), col("doc_b"), col("k_agree"), col("b_agree"),
          expr(s"(10000L * greatest(0L, 16 * b_agree - $NumHashes))" +
            s" DIV (15 * $NumHashes)").as("est_bp"),
          expr("(10000L * n_common) DIV n_union").as("jaccard_bp"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
