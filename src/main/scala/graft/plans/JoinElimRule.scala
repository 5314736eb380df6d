package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** PK/FK-constraint-informed JOIN ELIMINATION — the classic warehouse
  * optimization (Oracle/Snowflake `RELY` constraints) Spark OSS lacks
  * because parquet carries no uniqueness metadata: when a query joins
  * a fact table to a dimension but never reads a dimension column, a
  * declared key constraint proves the join is a no-op and the planner
  * drops it — at 100 TB that removes an entire shuffle + dimension
  * scan, the single biggest win available to generated BI SQL (which
  * habitually joins every dimension in the view definition).
  *
  * Declarations are promises the WAREHOUSE owner makes (exactly the
  * RELY contract — the engine does not re-validate them at plan time):
  *  - [[JoinElimRule.declarePk]](dimPath, pkCol): pkCol is UNIQUE and
  *    non-null in the dimension table at dimPath.
  *  - [[JoinElimRule.declareFk]](factPath, fkCol, dimPath, pkCol):
  *    fkCol is NON-NULL and every value exists in dim.pkCol
  *    (referential integrity).
  *
  * Soundness cases (each refusal is "keep the join", never a wrong
  * answer):
  *  - LEFT OUTER fact⟕dim ON fk = pk, no dim column consumed above:
  *    eliminable with the PK alone — every fact row survives a left
  *    join exactly once when the match count is ≤ 1, so the join's
  *    only possible effect (row multiplication) is ruled out. A
  *    dim-side FILTER is tolerated: filtering a unique column set
  *    keeps matches ≤ 1 and left rows are never dropped.
  *  - INNER fact⋈dim ON fk = pk, no dim column consumed: needs the
  *    full FK declaration (RI + non-null fk ⇒ every fact row matches
  *    exactly once). A dim-side filter DECLINES — it could drop fact
  *    rows — except `IsNotNull(pk)`, which the optimizer infers under
  *    every inner equi-join and the declared key makes a no-op.
  *    Either join orientation matches (the optimizer may have
  *    reordered).
  *  - Any dim column referenced above the join, a non-equi condition,
  *    a multi-root relation, or an undeclared table: decline.
  *
  * OFF by default — `spark.graft.joinElim.enabled=true`; sessions
  * attach via [[JoinElimRule.install]]/[[JoinElimRule.scoped]],
  * clusters via `spark.sql.extensions=graft.GraftExtensions`. The
  * reference delegates planning to host Impala, which performs the
  * same RELY-style elimination from HMS constraint metadata
  * (`/root/reference/README.md:40-51` assumes host-managed DDL).
  */
case class JoinElimRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import JoinElimRule._

  private def enabled: Boolean =
    spark.conf.get(EnabledKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // column pruning has run by the time extraOptimizations fire, so
      // a join whose dimension side is dead sits under a Project or
      // Aggregate that references only fact-side attributes. Project
      // and Aggregate DEFINE their output (nothing above reaches
      // through them), so their references bound what the join must
      // produce; intervening Filters pass columns through, so their
      // condition references accumulate on the way down.
      case p: Project =>
        rewriteChild(p.child, p.references)
          .map(c => p.copy(child = c)).getOrElse(p)
      case a: Aggregate =>
        rewriteChild(a.child, a.references)
          .map(c => a.copy(child = c)).getOrElse(a)
    }

  /** Descend a Filter/Project chain to a Join, accumulating the
    * filters' references into the consumed set; rebuild the chain on
    * success. Attribute-only Projects NARROW to the consumed set on
    * the way down — after an outer join eliminates, the column-pruned
    * Project the optimizer left between two stacked dim joins still
    * names the dead join key, and nothing re-runs ColumnPruning after
    * the extraOptimizations batch; dropping the unconsumed attrs here
    * lets the fixed point unwind the whole chain. */
  private def rewriteChild(p: LogicalPlan,
      consumed: AttributeSet): Option[LogicalPlan] = p match {
    case f: Filter =>
      rewriteChild(f.child, consumed ++ f.references)
        .map(c => f.copy(child = c))
    case pr @ Project(exprs, child)
        if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      val kept = exprs.filter(e => consumed.contains(e.toAttribute))
      rewriteChild(child, AttributeSet(kept.map(_.toAttribute)))
        .map(c => Project(kept, c))
    case j: Join => eliminate(j, consumed)
    case _ => None
  }

  /** If `j` is provably a no-op for a consumer referencing only
    * `consumed`, return the surviving side. */
  private def eliminate(j: Join, consumed: AttributeSet): Option[LogicalPlan] =
    j match {
      case Join(l, r, LeftOuter, Some(EqualTo(a: AttributeReference,
          b: AttributeReference)), _) if consumed.subsetOf(l.outputSet) =>
        val pk =
          if (l.outputSet.contains(a) && r.outputSet.contains(b)) b
          else if (l.outputSet.contains(b) && r.outputSet.contains(a)) a
          else return None
        // dim-side filters are tolerated unconditionally here: they
        // can only shrink the (≤ 1 under PK) match set, and a left
        // join never drops fact rows.
        dimOf(r).filter { case (dim, _) =>
          pks.get(dim).contains(pk.name)
        }.map { _ => logInfo(s"join-elim: dropped LEFT OUTER to $pk"); l }
      case Join(l, r, Inner, Some(EqualTo(a: AttributeReference,
          b: AttributeReference)), _) =>
        // either side may be the dimension after join reordering
        innerElim(l, r, a, b, consumed)
          .orElse(innerElim(r, l, a, b, consumed))
      case _ => None
    }

  /** Inner join: `fact` survives iff only its columns are consumed and
    * a RELY FK from the fact join key to the dim PK is declared. */
  private def innerElim(fact: LogicalPlan, dim: LogicalPlan,
      a: AttributeReference, b: AttributeReference,
      consumed: AttributeSet): Option[LogicalPlan] = {
    if (!consumed.subsetOf(fact.outputSet)) return None
    val (fk, pk) =
      if (fact.outputSet.contains(a) && dim.outputSet.contains(b)) (a, b)
      else if (fact.outputSet.contains(b) && dim.outputSet.contains(a)) (b, a)
      else return None
    for {
      (dimPath, dimFilters) <- dimOf(dim)
      if pks.get(dimPath).contains(pk.name)
      // a dim-side filter could drop fact rows — except IsNotNull on
      // the PK itself, which the optimizer infers under every inner
      // equi-join and which the declared (non-null, RI) key makes a
      // provable no-op.
      if dimFilters.flatMap(splitConjuncts).forall {
        case IsNotNull(a: AttributeReference) => a.name == pk.name
        case _ => false
      }
      (factPath, _) <- dimOf(fact)
      if fks.get((factPath, fk.name)).contains((dimPath, pk.name))
    } yield { logInfo(s"join-elim: dropped INNER to $pk via RELY FK"); fact }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Resolve a join side to its single-root relation path, looking
    * through attribute-only Projects and collecting Filter conditions
    * on the way down for the caller to vet. */
  private def dimOf(p: LogicalPlan): Option[(String, Seq[Expression])] =
    p match {
      case rel: LogicalRelation => rel.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
          Some((norm(fs.location.rootPaths.head), Nil))
        case _ => None
      }
      case Project(exprs, inner)
          if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        dimOf(inner)
      case Filter(cond, inner) =>
        dimOf(inner).map { case (path, fs) => (path, cond +: fs) }
      case _ => None
    }
}

object JoinElimRule {

  val EnabledKey = "spark.graft.joinElim.enabled"

  // dim path -> declared unique key column name
  private val pks = TrieMap.empty[String, String]
  // (fact path, fk col) -> (dim path, pk col), with RI + fk non-null
  private val fks = TrieMap.empty[(String, String), (String, String)]

  private[plans] def norm(p: Path): String = p.toUri.getPath

  private def norm(path: String): String = norm(new Path(path))

  /** Declare `pkCol` UNIQUE + non-null in the table at `dimPath`. */
  def declarePk(dimPath: String, pkCol: String): Unit =
    pks.put(norm(dimPath), pkCol)

  /** Declare referential integrity: `factPath.fkCol` is non-null and
    * every value exists in `dimPath.pkCol` (which must also be
    * declared a PK for elimination to fire). */
  def declareFk(factPath: String, fkCol: String,
      dimPath: String, pkCol: String): Unit =
    fks.put((norm(factPath), fkCol), (norm(dimPath), pkCol))

  /** Drop every declaration (test isolation). */
  def clear(): Unit = { pks.clear(); fks.clear() }

  /** Idempotently attach to this session and switch on. */
  def install(spark: SparkSession): Unit = {
    val mine = JoinElimRule(spark)
    if (!spark.experimental.extraOptimizations.contains(mine)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ mine
    }
    spark.conf.set(EnabledKey, "true")
  }

  /** Run `body` with the rule enabled, restoring the prior state. */
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
