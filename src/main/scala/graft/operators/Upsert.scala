package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog merge (CDC upsert) — apply a stream of keyed
  * upserts/deletes to a base snapshot, latest version wins. This is
  * the MERGE INTO of lakehouse table formats, expressed Spark-first
  * for a corpus that is continuously re-crawled/re-scored: the
  * changelog is whatever the ingest job emitted since the last
  * snapshot, and the merged result is the next snapshot.
  *
  * Scale shape — exactly two wide steps, both on the merge key:
  *   1. The changelog collapses to ONE row per key with a
  *      `max(struct(version, ...))` aggregate: lexicographic struct
  *      max, so it partial-aggregates map-side (the shuffle carries
  *      one struct per key per partition, not the raw changelog) and
  *      stays deterministic even if two changes share a version.
  *   2. One full-outer equi-join of snapshot and collapsed changelog
  *      on the key — inserts (change-only keys), updates (both), and
  *      untouched rows (base-only) fall out of the same join;
  *      tombstoned keys are filtered after it. A changelog is
  *      normally far smaller than its snapshot, so AQE turns this
  *      into a broadcast join; at equal sizes it is the plain
  *      shuffled join it should be.
  *
  * The base snapshot is read ONCE and never re-sorted; no windows, no
  * row_number (a per-key window would shuffle AND sort the snapshot).
  */
object Upsert {

  val OpUpsert = "U"
  val OpDelete = "D"

  /** Merge `changes` (keyCol, verCol, opCol, payload columns matching
    * `base`'s non-key columns) into `base` (keyCol + payload
    * columns). Returns the next snapshot: one row per surviving key. */
  def merge(base: DataFrame, changes: DataFrame, keyCol: String,
      verCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    require(payload.nonEmpty, "base must carry at least one payload column")
    // latest change per key: struct max orders by version first; op and
    // payload fields only break exact version ties, deterministically
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max(struct((col(verCol) +: col(opCol) +: payload.map(col)): _*))
        .as("_c"))
    base.as("b")
      .join(latest.as("c"), Seq(keyCol), "full_outer")
      .where(col("_c").isNull || col(s"_c.$opCol") =!= OpDelete)
      .select(col(keyCol) +: payload.map(p =>
        when(col("_c").isNotNull, col(s"_c.$p")).otherwise(col(s"b.$p")).as(p)): _*)
  }
}
