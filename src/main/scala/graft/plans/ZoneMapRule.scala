package graft.plans

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Optimizer rule: automatic zone-map file skipping. A plain
  * `spark.read.parquet(path).where(key BETWEEN lo AND hi)` over a
  * range-clustered table prunes the non-overlapping files with NO API
  * call — the finish of [[graft.operators.ZoneMap.skippingScan]]'s
  * explicit form (the round-5 verdict's item 2): the user query stays
  * declarative and the layout's skipping benefit arrives through the
  * planner, exactly how table formats (Delta/Iceberg) deliver it.
  *
  * Mechanics: when a Filter sits on a single-root parquet relation and
  * constrains an integral column to a finite range, the rule looks for
  * a persisted zone map at the sibling-directory convention
  * [[graft.operators.ZoneMap.zoneMapPath]] (written by
  * `ZoneMap.persist`). If one exists AND is no older than every data
  * file (a stale map must never prune — rewritten files could hold new
  * key ranges), the relation's [[FileIndex]] is wrapped so files whose
  * [lo, hi] zone cannot match the predicate are dropped from the
  * listing. Files the map does not know are always kept, and the
  * Filter itself is retained — the rewrite is semantics-preserving by
  * construction (zone overlap never implies every row matches; q111
  * gates result-invisibility against the unclustered oracle).
  *
  * The zone map read is planning-time METADATA work (one row per file
  * — the same object class as the file listing itself), memoized per
  * (path, commit mtime) so repeated planning reads it once. OFF by
  * default — enable with `spark.graft.zoneMap.enabled=true`; local
  * sessions attach it via [[ZoneMapRule.install]], clusters via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
case class ZoneMapRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import ZoneMapRule._

  private def enabled: Boolean =
    spark.conf.get(EnabledKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        (rel.relation match {
          // single-root, not already pruned: the wrapping guard is what
          // lets the rule reach a fixed point in the optimizer batch
          case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 &&
              !fs.location.isInstanceOf[ZonePrunedFileIndex] =>
            prune(cond, rel, fs)
          case _ => None
        }).getOrElse(f)
    }

  private def prune(cond: Expression, rel: LogicalRelation,
      fs: HadoopFsRelation): Option[LogicalPlan] = {
    val root = fs.location.rootPaths.head.toUri.getPath
    val boundsByCol = extractBounds(cond, rel.outputSet)
    if (boundsByCol.isEmpty) return None
    val files = fs.location.listFiles(Nil, Nil).flatMap(_.files)
    if (files.isEmpty) return None
    // Driver-memory bound: the zone map is one row per data file held
    // on the driver during planning. Past the cap we decline to prune
    // (correct, just unaccelerated) rather than risk planner OOM.
    val maxFiles = spark.conf.get(MaxFilesKey, "100000").toInt
    if (files.length > maxFiles) {
      logWarning(s"zone-map skipping disabled for $root: ${files.length} " +
        s"data files exceed $MaxFilesKey=$maxFiles; scanning unpruned")
      return None
    }
    val newestData = files.map(_.getModificationTime).max
    // first bounded column with a fresh persisted zone map wins
    boundsByCol.view.flatMap { case (colName, (lo, hi)) =>
      val zmPath = graft.operators.ZoneMap.zoneMapPath(root, colName)
      loadFreshZones(spark, zmPath, newestData).flatMap { zones =>
        val known = zones.map(_.file).toSet
        val live = zones.filter(z => z.hi >= lo && z.lo <= hi).map(_.file).toSet
        val keep = (p: String) => !known.contains(p) || live.contains(p)
        // only rewrite when something is actually pruned
        if (files.forall(f => keep(norm(f.getPath)))) None
        else Some(Filter(cond, rel.copy(relation =
          fs.copy(location = new ZonePrunedFileIndex(fs.location, keep))(
            fs.sparkSession))))
      }
    }.headOption
  }

  /** Conjunct-wise finite bounds per integral attribute: >=, >, <=, <,
    * =, and their literal-first mirrors, intersected. Columns with no
    * finite bound are dropped (a one-sided range still prunes). */
  private def extractBounds(cond: Expression,
      attrs: AttributeSet): Map[String, (Long, Long)] = {
    val bounds = mutable.LinkedHashMap.empty[String, (Long, Long)]
    def tighten(a: AttributeReference, lo: Option[Long], hi: Option[Long]): Unit =
      if ((a.dataType == LongType || a.dataType == IntegerType) &&
          attrs.contains(a)) {
        val (clo, chi) = bounds.getOrElse(a.name, (Long.MinValue, Long.MaxValue))
        bounds(a.name) = (math.max(clo, lo.getOrElse(Long.MinValue)),
          math.min(chi, hi.getOrElse(Long.MaxValue)))
      }
    def litLong(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue)
      case j: java.lang.Long => Some(j.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case _ => None
    }
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    def pred(v: Long): Long = if (v == Long.MinValue) v else v - 1
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        tighten(a, litLong(l), None)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        tighten(a, None, litLong(l))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        tighten(a, litLong(l).map(succ), None)
      case LessThan(a: AttributeReference, l: Literal) =>
        tighten(a, None, litLong(l).map(pred))
      case EqualTo(a: AttributeReference, l: Literal) =>
        tighten(a, litLong(l), litLong(l))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        tighten(a, None, litLong(l))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        tighten(a, litLong(l), None)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        tighten(a, None, litLong(l).map(pred))
      case LessThan(l: Literal, a: AttributeReference) =>
        tighten(a, litLong(l).map(succ), None)
      case EqualTo(l: Literal, a: AttributeReference) =>
        tighten(a, litLong(l), litLong(l))
      case _ =>
    }
    bounds.filter { case (_, (lo, hi)) =>
      lo != Long.MinValue || hi != Long.MaxValue
    }.toMap
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}

object ZoneMapRule {

  val EnabledKey = "spark.graft.zoneMap.enabled"
  val MaxFilesKey = "spark.graft.zoneMap.maxFiles"

  final case class Zone(file: String, lo: Long, hi: Long)

  /** URI-path normalization so `input_file_name()` strings (the zone
    * map's file column) compare equal to `Path.toString` forms
    * ("file:///a/b" vs "file:/a/b"). */
  private[plans] def norm(p: Path): String = p.toUri.getPath
  private def norm(s: String): String = norm(new Path(s))

  /** Planning-time zone-map load, memoized per (path, _SUCCESS mtime).
    * Returns None unless the map exists and is at least as new as the
    * newest data file — a stale map must never prune. */
  private val zoneCache = TrieMap.empty[(String, Long), Seq[Zone]]

  private def loadFreshZones(spark: SparkSession, zmPath: String,
      newestDataMtime: Long): Option[Seq[Zone]] = {
    val marker = new Path(zmPath, "_SUCCESS")
    val fsys = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fsys.exists(marker)) return None
    val mt = fsys.getFileStatus(marker).getModificationTime
    // STRICTLY newer than the newest data file: a table rewrite landing
    // within the filesystem's mtime granularity of the map must read as
    // stale (no prune) — equality cannot distinguish map-then-rewrite
    // from rewrite-then-map.
    if (mt <= newestDataMtime) return None
    Some(zoneCache.getOrElseUpdate((zmPath, mt),
      spark.read.parquet(zmPath)
        .selectExpr("file", "CAST(lo AS BIGINT) AS lo", "CAST(hi AS BIGINT) AS hi")
        // an all-NULL key column yields NULL min/max; such files carry
        // no usable zone — treat them as unknown (always kept), and
        // never NPE planning over them
        .where("lo IS NOT NULL AND hi IS NOT NULL")
        .collect().toSeq
        .map(r => Zone(norm(r.getString(0)), r.getLong(1), r.getLong(2)))))
  }

  /** Idempotently attach the rule to this session's extra
    * optimizations and switch it on — the local-session analog of the
    * `spark.sql.extensions=graft.GraftExtensions` cluster path. */
  def install(spark: SparkSession): Unit = {
    val mine = ZoneMapRule(spark)
    if (!spark.experimental.extraOptimizations.contains(mine)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ mine
    }
    spark.conf.set(EnabledKey, "true")
  }

  /** Run `body` with the rule installed and enabled, then restore the
    * prior enabled state — so a single query can opt into automatic
    * skipping without leaving every later parquet Filter in the session
    * paying planning-time zone-map filesystem probes. Callers that need
    * the rewrite to survive past the scope must force planning inside
    * (e.g. touch `df.queryExecution.executedPlan`): QueryExecution's
    * plans are lazy-once, so a plan materialized here keeps its pruned
    * scan after the flag resets. */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val prior = spark.conf.getOption(EnabledKey)
    install(spark)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(EnabledKey, v)
      case None => spark.conf.set(EnabledKey, "false")
    }
  }
}

/** A [[FileIndex]] wrapper that drops files the zone map proved
  * irrelevant — listing, input-file, and size views all agree, and
  * everything else delegates (no re-listing: at 100 TB the original
  * index already paid the listing; pruning is a filter over it). */
final class ZonePrunedFileIndex(underlying: FileIndex, keep: String => Boolean)
    extends FileIndex {

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters).map { pd =>
      pd.copy(files = pd.files.filter(f => keep(ZoneMapRule.norm(f.getPath))))
    }

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s => keep(ZoneMapRule.norm(new Path(s))))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)).sum

  override def partitionSchema: StructType = underlying.partitionSchema
}
