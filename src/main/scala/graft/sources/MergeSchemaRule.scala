package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{AppendData,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** AUTOMATIC SCHEMA EVOLUTION ON WRITE (the Delta `mergeSchema`
  * model): a BY-NAME append whose frame carries columns the table
  * lacks EVOLVES the table first (append-only ADD COLUMN, field-id
  * assigned, metadata-only — history is never backfilled, old rows
  * read NULL by prefix-arity padding, so a 100 TB table evolves in
  * O(1)); Spark's normal by-name resolution then aligns, casts, and
  * NULL-fills missing columns exactly as stock. Opt-in per write
  * (`writeTo(t).option("mergeSchema", "true")`) or per session
  * (`spark.graft.schema.autoMerge.enabled=true`, covering SQL
  * `INSERT INTO ... BY NAME`).
  *
  * Placement: the HINT-RESOLUTION batch, which runs BEFORE the
  * Resolution batch — by the time Spark's `ResolveOutputRelation`
  * validates the write, the table already carries the new columns, so
  * every built-in rail (type casts, arity errors for positional
  * inserts, MERGE resolution) stays completely stock. The rule is a
  * pure catalog side effect: it never rewrites the plan. This avoids
  * `ACCEPT_ANY_SCHEMA` entirely — that capability silently disables
  * Spark's MERGE/UPDATE assignment resolution for the table (the
  * connector is expected to re-implement it, as Delta does), which is
  * a price this engine refuses for one write option.
  *
  * Caveat: Spark's `HiveSessionStateBuilder` does not wire injected
  * hint-resolution rules into its analyzer (the in-memory builder
  * does), so under a Hive-enabled session this DataFrame-path rule is
  * absent and the write fails with Spark's stock arity error — loud,
  * never silent. The SQL path (`INSERT INTO ... BY NAME` under
  * `spark.graft.schema.autoMerge.enabled`) intercepts in the PARSER
  * delegate instead ([[GraftSqlParser]]), which every session state
  * builder honors. */
final class MergeSchemaRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def confOn: Boolean =
    spark.conf.getOption("spark.graft.schema.autoMerge.enabled")
      .exists(_.equalsIgnoreCase("true"))

  private def optedIn(opts: Map[String, String]): Boolean =
    opts.get("mergeSchema").exists(_.equalsIgnoreCase("true")) || confOn

  /** The live store of `cat.tbl` when `cat` is a graft catalog in
    * this session (loads through the catalog manager, so a restarted
    * table replays first). */
  private def storeFor(parts: Seq[String]): Option[MemStore] =
    parts match {
      case Seq(cat, tbl) if spark.conf
          .getOption(s"spark.sql.catalog.$cat")
          .contains(classOf[MemCatalog].getName) =>
        try {
          spark.sessionState.catalogManager.catalog(cat) match {
            case tc: TableCatalog =>
              tc.loadTable(Identifier.of(Array.empty, tbl))
            case _ => ()
          }
        } catch { case _: Exception => () }
        MemCatalog.storeOf(cat, tbl)
      case _ => None
    }

  private def evolve(store: MemStore, queryOut: Seq[
      org.apache.spark.sql.catalyst.expressions.Attribute]): Unit = {
    val resolver = spark.sessionState.conf.resolver
    val extras = queryOut.filterNot(attr =>
      store.schema.fieldNames.exists(n => resolver(n, attr.name)))
    if (extras.nonEmpty) {
      val evolved = extras.foldLeft(store.physSchema) { (s, attr) =>
        s.add(org.apache.spark.sql.types.StructField(attr.name,
          attr.dataType, nullable = true,
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(ColumnMapping.IdKey, ColumnMapping.nextId(s))
            .build()))
      }
      store.evolveSchema(evolved)
    }
  }

  /** Is this (possibly aliased, still unresolved) merge target a
    * graft-catalog table? */
  private def graftTarget(t: LogicalPlan): Boolean = t match {
    case org.apache.spark.sql.catalyst.plans.logical
        .SubqueryAlias(_, child) => graftTarget(child)
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
      spark.conf.getOption(
        s"spark.sql.catalog.${u.multipartIdentifier.head}")
        .contains(classOf[MemCatalog].getName)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan match {
      // MERGE under the session conf: flip the statement to Spark's
      // own `WITH SCHEMA EVOLUTION` form — the stock
      // ResolveMergeIntoSchemaEvolution then computes the ADD COLUMNs
      // and routes them through alterTable (graft targets only; other
      // catalogs keep their own semantics)
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
          if !m.withSchemaEvolution && confOn && graftTarget(m.targetTable) =>
        return m.copy(withSchemaEvolution = true)
      case _ => ()
    }
    plan match {
      // DataFrame path: df.writeTo(t).option("mergeSchema").append().
      // DataFrameWriterV2 captures the frame's RAW logical plan (its
      // top operator can be unresolved even though the Dataset was
      // analyzed eagerly), so analyze the CHILD alone when needed —
      // bounded: only under the opt-in, only for graft tables.
      // ROOT-ONLY match: a v2 write command is always the plan root,
      // and this rule runs in a to-fixed-point analyzer batch on
      // EVERY query — a whole-tree walk here is pure fixed overhead
      // for the 99% of plans that are not writes.
      case a: AppendData if a.isByName && optedIn(a.writeOptions) =>
        a.table match {
          case u: UnresolvedRelation =>
            storeFor(u.multipartIdentifier).foreach { store =>
              val q = if (a.query.resolved) a.query
                else spark.sessionState.analyzer.execute(a.query)
              if (q.resolved) evolve(store, q.output)
            }
          case _ => ()
        }
      case _ => ()
    }
    plan
  }
}
