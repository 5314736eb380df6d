package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  *
  * Freshness cannot see CODE changes (mtime only), so every path
  * embeds [[FormatVersion]] — bump it when any build algorithm
  * changes and stale artifacts from older code become unreachable
  * instead of silently served. DERIVED artifacts (an index built
  * from a persisted centroid artifact) must pass the upstream
  * artifact's `_SUCCESS` marker as an extra source, so rebuilding
  * the upstream alone invalidates them too.
  *
  * Writes go to a temp directory and move into place, so a reader in
  * another session never scans a half-written artifact; the final
  * swap (delete old, move new) assumes a SINGLE WRITER per artifact
  * — the scheduled-ETL model this store miniaturizes.
  */
object IndexStore {

  /** Bump when any artifact-building algorithm changes shape or
    * semantics: the version is part of every artifact path, so old
    * artifacts are simply never addressed again. */
  val FormatVersion = 2

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
    * mtime freshness alone cannot see code/config changes. The code
    * format version is a path segment for the same reason. */
  def artifactPath(sfDir: String, name: String): String =
    s"$root/v$FormatVersion/${slug(sfDir)}/$name"

  /** The artifact's parquet commit marker — pass this as an extra
    * source when building a DERIVED artifact on top of it. */
  def successMarker(path: String): String = s"$path/_SUCCESS"

  /** Commit-marker mtime (0 when absent) — the freshness stamp a
    * session-scoped memo of a DERIVED frame must carry in its key, so
    * rebuilding the upstream artifact mid-session addresses a fresh
    * memo entry instead of silently serving the stale frame. */
  def markerMtime(path: String): Long = {
    val ok = Paths.get(path, "_SUCCESS")
    if (Files.exists(ok)) Files.getLastModifiedTime(ok).toMillis else 0L
  }

  /** Fresh = parquet commit marker exists, every source file exists,
    * and the marker is at least as new as each source. A MISSING
    * source is deliberately not-fresh: rebuilding then fails loudly
    * on the bad path instead of silently serving a stale artifact. */
  private[operators] def isFresh(path: String, sources: Seq[String]): Boolean = {
    val ok = Paths.get(path, "_SUCCESS")
    Files.exists(ok) && sources.forall { s =>
      val src = Paths.get(s)
      Files.exists(src) &&
        Files.getLastModifiedTime(ok).compareTo(Files.getLastModifiedTime(src)) >= 0
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }

  /** Force-build: evaluate `build`, persist to `path` (written to a
    * temp sibling, then moved into place so concurrent readers never
    * see a partial write), return a frame reading the persisted
    * artifact (so downstream plans scan parquet, not the build
    * lineage). Single writer per artifact assumed. */
  def rebuild(spark: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    val tmp = s"$path.inprogress"
    deleteRecursively(Paths.get(tmp))
    build.write.mode("overwrite").parquet(tmp)
    deleteRecursively(Paths.get(path))
    Files.move(Paths.get(tmp), Paths.get(path),
      StandardCopyOption.ATOMIC_MOVE)
    spark.read.parquet(path)
  }

  /** Read the persisted artifact when fresh against EVERY source
    * (the raw table, plus upstream artifacts' `_SUCCESS` markers for
    * derived artifacts), else build + persist. */
  def readOrBuild(spark: SparkSession, path: String, sourceFile: String,
      extraSources: String*)(build: => DataFrame): DataFrame =
    if (isFresh(path, sourceFile +: extraSources)) spark.read.parquet(path)
    else rebuild(spark, path)(build)
}
