package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memoized, materialized intermediate frames, keyed per (session,
  * tag). Several query families share wide generated projections
  * (MinHash sketches, IVF cell assignments); `.cache()` deduplicates
  * the DATA but every consumer still re-plans and re-CODEGEN's the
  * full expression tree — measured at ~35 s of Janino time across the
  * near-dup queries alone at sf0.1. Checkpointing truncates the
  * lineage instead: downstream plans read the materialized rows, so
  * each shared expression compiles and runs exactly once per session.
  *
  * DURABILITY SCOPE: the default materialization is `localCheckpoint`
  * — executor-resident, NOT fault-tolerant. Losing an executor loses
  * its blocks and the frame cannot be recomputed (lineage was
  * truncated); that is acceptable for single-JVM bench/verify runs,
  * which is this memo's default scope. Cluster deployments set
  * [[ReliableKey]] = true, and memoized frames then go through the
  * RELIABLE checkpoint dir instead (the same
  * `SparkContext.setCheckpointDir` convention the connected-components
  * loop uses — set it to a durable HDFS/object-store path first; a
  * local temp dir is created as a last resort). The cache-first
  * pattern avoids the documented double-compute of bare
  * `checkpoint()`.
  *
  * CONTRACT: a memoized frame reflects the input AS OF its first use
  * in the session — like any materialized index. Callers that rewrite
  * the underlying files mid-session must call [[invalidate]] (or use
  * a fresh session). Sessions are held via weak references, so a
  * stopped, dereferenced session's entries become collectable instead
  * of pinning checkpointed RDDs forever — and two sessions can never
  * collide on a reused hash.
  */
private[graft] object FrameMemo {

  /** Set true to materialize memo frames through the reliable
    * checkpoint dir (fault-tolerant; survives executor loss) instead
    * of executor-resident `localCheckpoint`. */
  val ReliableKey = "spark.graft.memo.reliable"

  private val memo =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  private def forSession(spark: SparkSession) = memo.synchronized {
    var m = memo.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
      memo.put(spark, m)
    }
    m
  }

  private def materialize(spark: SparkSession, df: DataFrame): DataFrame =
    checkpointed(df)

  /** Materialize `df` with truncated lineage, honoring [[ReliableKey]]:
    * reliable checkpoint dir when the conf is true (survives executor
    * loss — the posture a multi-hour 100 TB run needs), executor-
    * resident `localCheckpoint` otherwise. EVERY iterative operator's
    * per-round truncation goes through here ([[graft.operators.PageRank]],
    * [[graft.operators.BpeTrain]], the connected-components loop, the
    * q129/q164 removal-start materialization) so one conf flips the
    * whole library's durability posture. */
  def checkpointed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableKey, "false").toBoolean) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-memo-ckpt").toString)
      }
      // cache first: a bare checkpoint() recomputes the whole lineage
      // a second time to write the files; the write job reads the
      // cache instead, and the cache stays as the serving copy
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .checkpoint()
    } else df.localCheckpoint()
  }

  /** Build-once per (session, key): the by-name `build` is evaluated
    * and eagerly materialized on first use. */
  def memoized(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    forSession(spark).getOrElseUpdate(key, materialize(spark, build))

  /** Drop every memoized frame of `spark` — required after rewriting
    * input files the memoized frames were derived from. */
  def invalidate(spark: SparkSession): Unit =
    memo.synchronized { memo.remove(spark) }
}
