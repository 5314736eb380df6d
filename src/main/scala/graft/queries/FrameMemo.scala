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
  */
private[graft] object FrameMemo {

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  /** Build-once per (session, key): the by-name `build` is evaluated
    * and eagerly localCheckpoint'ed on first use. */
  def memoized(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    memo.getOrElseUpdate(
      (System.identityHashCode(spark), key),
      build.localCheckpoint())
}
