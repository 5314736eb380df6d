package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memoized, materialized intermediate frames, keyed per (session,
  * tag). Several query families share wide generated projections
  * (MinHash sketches, IVF cell assignments); `.cache()` deduplicates
  * the DATA but every consumer still re-plans and re-CODEGEN's the
  * full expression tree — measured at ~35 s of Janino time across the
  * near-dup queries alone at sf0.1. `localCheckpoint` truncates the
  * lineage instead: downstream plans read the materialized rows, so
  * each shared expression compiles and runs exactly once per session.
  * At cluster scale the same role is played by writing the
  * intermediate frame to parquet (or checkpointing to HDFS) between
  * pipeline stages.
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

  /** Build-once per (session, key): the by-name `build` is evaluated
    * and eagerly localCheckpoint'ed on first use. */
  def memoized(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    forSession(spark).getOrElseUpdate(key, build.localCheckpoint())

  /** Drop every memoized frame of `spark` — required after rewriting
    * input files the memoized frames were derived from. */
  def invalidate(spark: SparkSession): Unit =
    memo.synchronized { memo.remove(spark) }
}
