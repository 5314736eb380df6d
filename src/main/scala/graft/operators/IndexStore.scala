package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted index artifacts (SURVEY §2.3 similarity — the scale
  * path's missing piece): an ANN index is built ONCE and reused by
  * every probe query, so the build must not be re-paid inside each
  * probe — at 100 TB it is a scheduled ETL job writing parquet next
  * to the corpus, and probes are plain scans of that artifact (with
  * predicate pushdown on the probe keys).
  *
  * This store is that pattern in miniature: artifacts live under a
  * per-fixture directory, `readOrBuild` reads the parquet when it is
  * PRESENT AND FRESH (artifact newer than its source table — a stale
  * index silently poisoning probes is worse than a rebuild) and
  * otherwise builds + persists it. `rebuild` forces the write — the
  * declared build query (q00) uses it so the bench times the real
  * build cost in ONE attributed entry instead of smearing it into
  * whichever probe runs first.
  */
object IndexStore {

  /** Artifact root — a JVM property so tests can isolate themselves. */
  def root: String = sys.props.getOrElse("graft.index.store", "/tmp/graft_index")

  /** Collision-proof per-fixture directory: the readable sanitized
    * path PLUS a hash of the exact original — two distinct fixture
    * dirs that sanitize identically ("/d/sf_1" vs "/d/sf/1") must
    * never share an artifact, or one corpus would silently probe the
    * other's index. */
  private def slug(sfDir: String): String = {
    val readable = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val md = java.security.MessageDigest.getInstance("MD5")
    val tag = md.digest(sfDir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"$readable-$tag"
  }

  /** Artifact names should embed the build configuration (e.g.
    * "ivf_centroids_c16_i2") so a config change addresses a NEW
    * artifact instead of serving one built under old parameters —
    * mtime freshness alone cannot see code/config changes. */
  def artifactPath(sfDir: String, name: String): String =
    s"$root/${slug(sfDir)}/$name"

  /** Fresh = parquet commit marker exists, the source file exists,
    * and the marker is at least as new as the source. A MISSING
    * source is deliberately not-fresh: rebuilding then fails loudly
    * on the bad path instead of silently serving a stale artifact. */
  private[operators] def isFresh(path: String, sourceFile: String): Boolean = {
    val ok = Paths.get(path, "_SUCCESS")
    val src = Paths.get(sourceFile)
    Files.exists(ok) && Files.exists(src) &&
      Files.getLastModifiedTime(ok).compareTo(Files.getLastModifiedTime(src)) >= 0
  }

  /** Force-build: evaluate `build`, persist to `path`, return a frame
    * reading the persisted artifact (so downstream plans scan parquet,
    * not the build lineage). */
  def rebuild(spark: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    build.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Read the persisted artifact when fresh, else build + persist. */
  def readOrBuild(spark: SparkSession, path: String, sourceFile: String)(
      build: => DataFrame): DataFrame =
    if (isFresh(path, sourceFile)) spark.read.parquet(path)
    else rebuild(spark, path)(build)
}
