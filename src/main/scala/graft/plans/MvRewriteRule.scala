package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, count, greatest, least,
  lit, max, min, sum, when}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** MATERIALIZED-VIEW rewrite — the warehouse accelerator every
  * dashboard stack leans on at 100 TB: a registered pre-aggregation
  * (a parquet artifact holding per-group count/sum/min/max partials)
  * silently serves any aggregate query whose grouping is a SUBSET of
  * the view's keys and whose aggregates are derivable from the
  * partials — the corpus scan becomes an O(groups) artifact scan,
  * with the user's SQL untouched (the q245 incremental-maintenance
  * algebra, moved into the planner).
  *
  * Soundness guards (each refusal is just "no acceleration", never a
  * wrong answer):
  *  - FRESHNESS: the artifact's commit marker must be STRICTLY newer
  *    than the newest base data file (the ZoneMapRule staleness
  *    discipline) — a stale view never serves.
  *  - Only count(non-null literal), sum/min/max over the view's
  *    REGISTERED measure columns, none DISTINCT. `avg` and friends
  *    are declined (rewriting them re-associates float division).
  *  - Measures are restricted to INTEGRAL columns at registration:
  *    re-aggregating integer partials is exact under any grouping;
  *    re-summing float partials would change the addition order.
  *  - Grouping keys must be plain attributes of the view's key set.
  *
  * OFF by default — `spark.graft.mvRewrite.enabled=true`; sessions
  * attach via [[MvRewriteRule.install]]/[[MvRewriteRule.scoped]],
  * clusters via `spark.sql.extensions=graft.GraftExtensions`.
  */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import MvRewriteRule._

  private def enabled: Boolean =
    spark.conf.get(EnabledKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        baseRelation(child).flatMap { case (rel, fs) =>
          lookup(fs).flatMap(mv => rewrite(agg, rel, fs, mv))
        }.getOrElse(agg)
    }

  /** The aggregate's child must be the base relation, optionally under
    * the attribute-only Project column pruning inserts. */
  private def baseRelation(child: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation)] = child match {
    case rel: LogicalRelation => rel.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        Some((rel, fs))
      case _ => None
    }
    case Project(exprs, inner) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      baseRelation(inner)
    case _ => None
  }

  private def lookup(fs: HadoopFsRelation): Option[MvDef] =
    registry.get(norm(fs.location.rootPaths.head))

  private def rewrite(agg: Aggregate, rel: LogicalRelation,
      fs: HadoopFsRelation, mv: MvDef): Option[LogicalPlan] = {
    // freshness: the view must be strictly newer than every base file
    val files = fs.location.listFiles(Nil, Nil).flatMap(_.files)
    if (files.isEmpty) return None
    val newestData = files.map(_.getModificationTime).max
    val marker = new Path(mv.mvPath, "_SUCCESS")
    val fsys = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fsys.exists(marker) ||
      fsys.getFileStatus(marker).getModificationTime <= newestData) return None

    // every grouping expression is a plain attribute within the keys
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) => a
      case _ => return None
    }

    val mvPlan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
    val mvAttr: Map[String, Attribute] =
      mvPlan.output.map(a => a.name -> a).toMap

    def derived(e: AggregateExpression): Option[Expression] = {
      if (e.isDistinct || e.filter.isDefined) return None
      e.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          Some(Sum(mvAttr(CntCol)).toAggregateExpression())
        case Sum(a: AttributeReference, _) if mv.measures.contains(a.name) =>
          Some(Sum(mvAttr(s"__sum_${a.name}")).toAggregateExpression())
        case Min(a: AttributeReference) if mv.measures.contains(a.name) =>
          Some(Min(mvAttr(s"__min_${a.name}")).toAggregateExpression())
        case Max(a: AttributeReference) if mv.measures.contains(a.name) =>
          Some(Max(mvAttr(s"__max_${a.name}")).toAggregateExpression())
        case _ => None
      }
    }

    val newGroupings = groupAttrs.map(a => mvAttr(a.name))
    val newResults: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(e: AggregateExpression, name) =>
        derived(e) match {
          case Some(d) => Alias(d, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }
    // rewritten types must match the original output exactly — Sum over
    // a LONG partial is LONG, but a mismatch (e.g. an INT measure whose
    // re-sum widens) must decline rather than change the schema
    val sameTypes = newResults.zip(agg.aggregateExpressions)
      .forall { case (n, o) => n.dataType == o.dataType }
    if (!sameTypes) return None
    logInfo(s"mv-rewrite: serving aggregate over ${norm(fs.location.rootPaths.head)} " +
      s"from ${mv.mvPath}")
    Some(Aggregate(newGroupings, newResults, mvPlan))
  }
}

object MvRewriteRule {

  val EnabledKey = "spark.graft.mvRewrite.enabled"
  private[plans] val CntCol = "__cnt"

  /** A registered view: base table root, grouping keys, integral
    * measure columns, artifact path. */
  final case class MvDef(basePath: String, groupCols: Seq[String],
      measures: Seq[String], mvPath: String)

  private val registry = TrieMap.empty[String, MvDef]

  private[plans] def norm(p: Path): String = p.toUri.getPath

  /** Build + persist the view artifact (count/sum/min/max partials per
    * group, via the IndexStore atomic-write discipline) and register
    * it for rewriting. Measures must be integral — re-aggregating
    * integer partials is exact under any coarser grouping. */
  def create(spark: SparkSession, basePath: String, groupCols: Seq[String],
      measures: Seq[String]): MvDef = {
    val base = spark.read.parquet(basePath)
    measures.foreach { m =>
      val dt = base.schema(m).dataType
      require(dt == LongType || dt == IntegerType,
        s"MV measures must be integral (exact re-aggregation); $m is $dt")
    }
    val aggs = count(lit(1)).as(CntCol) +: measures.flatMap(m => Seq(
      sum(col(m)).as(s"__sum_$m"), min(col(m)).as(s"__min_$m"),
      max(col(m)).as(s"__max_$m")))
    val name = "mv_" + (groupCols ++ measures).mkString("_")
      .replaceAll("[^A-Za-z0-9_]", "_")
    val mvPath = graft.operators.IndexStore.artifactPath(basePath, name)
    graft.operators.IndexStore.rebuild(spark, mvPath) {
      base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val mv = MvDef(norm(new Path(basePath)), groupCols, measures, mvPath)
    registry.put(mv.basePath, mv)
    mv
  }

  /** INCREMENTAL refresh (the q245 maintenance algebra applied to the
    * view artifact): fold a delta batch's partials into the persisted
    * partials through one full-outer group join — counts and sums
    * add, mins/maxes fold — instead of re-scanning the base table.
    * The result is written through the same atomic-rebuild path, so
    * the artifact's freshness stamp advances and the rewrite serves
    * the refreshed state. The DELTA must be exactly the rows appended
    * to the base since the artifact was built (the caller's CDC
    * contract — MvRewriteSpec pins refresh == full rebuild). */
  def refresh(spark: SparkSession, mv: MvDef, delta: DataFrame): DataFrame = {
    val cur = spark.read.parquet(mv.mvPath)
    val aggs = count(lit(1)).as(CntCol) +: mv.measures.flatMap(m => Seq(
      sum(col(m)).as(s"__sum_$m"), min(col(m)).as(s"__min_$m"),
      max(col(m)).as(s"__max_$m")))
    val d = delta.groupBy(mv.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    def side(df: DataFrame, tag: String) = df.select(
      mv.groupCols.map(col) ++
        df.columns.filter(_.startsWith("__")).map(c => col(c).as(s"$c$tag")): _*)
    val merged = side(cur, "_a")
      .join(side(d, "_b"), mv.groupCols, "full_outer")
      .select(mv.groupCols.map(col) ++ Seq(
        (coalesce(col(s"${CntCol}_a"), lit(0L)) +
          coalesce(col(s"${CntCol}_b"), lit(0L))).as(CntCol)) ++
        mv.measures.flatMap(m => Seq(
          // Spark's Sum is NULL over an all-NULL group — a 0L coalesce
          // here would make refresh diverge from a full rebuild for
          // groups whose measure is NULL in every row
          when(col(s"__sum_${m}_a").isNull && col(s"__sum_${m}_b").isNull,
            lit(null))
            .otherwise(coalesce(col(s"__sum_${m}_a"), lit(0L)) +
              coalesce(col(s"__sum_${m}_b"), lit(0L))).as(s"__sum_$m"),
          least(col(s"__min_${m}_a"), col(s"__min_${m}_b")).as(s"__min_$m"),
          greatest(col(s"__max_${m}_a"), col(s"__max_${m}_b")).as(s"__max_$m"))): _*)
    graft.operators.IndexStore.rebuild(spark, mv.mvPath)(merged)
  }

  /** Drop every registration (test isolation). */
  def clear(): Unit = registry.clear()

  /** Idempotently attach to this session and switch on. */
  def install(spark: SparkSession): Unit = {
    val mine = MvRewriteRule(spark)
    if (!spark.experimental.extraOptimizations.contains(mine)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ mine
    }
    spark.conf.set(EnabledKey, "true")
  }

  /** Run `body` with the rule enabled, restoring the prior state after
    * (plans materialized inside keep their rewrite — the ZoneMapRule
    * scoped contract). */
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
