package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.types.StructType

/** WRITE-TIME CONSTRAINTS (the Delta invariants model): `NOT NULL`
  * per column and named `CHECK (expr)` predicates, enforced in the
  * WRITE TASKS — a violating INSERT / MERGE / streaming epoch aborts
  * before any commit version lands (the normal DSv2 abort path
  * deletes the staged files, so atomicity is free), and adding a
  * constraint validates the EXISTING live rows first.
  *
  * Keying: NOT NULL is FIELD-ID keyed, so it survives RENAME COLUMN;
  * CHECK expressions are SQL text over the logical column names —
  * renaming or dropping a referenced column is REFUSED (the
  * Postgres-style dependency rule: loud, never silently stale).
  *
  * SQL semantics: a CHECK is violated only when the predicate
  * evaluates to FALSE — NULL passes (ANSI), exactly how Delta's
  * CHECK constraints behave. */
private[sources] final case class CheckConstraint(name: String, sql: String)

private[sources] final case class TableConstraints(
    notNullIds: Set[Long] = Set.empty,
    checks: Vector[CheckConstraint] = Vector.empty) {
  def isEmpty: Boolean = notNullIds.isEmpty && checks.isEmpty
}

/** Violation signal — surfaces as the write job's failure cause. */
final class ConstraintViolationException(msg: String)
  extends RuntimeException(msg)

/** Serializable per-row validator, bound to the LOGICAL row layout
  * (every write path validates the incoming logical row before the
  * physical expansion). Evaluation is interpreted Catalyst eval —
  * bound expressions are serializable and need no codegen. */
private[sources] final class RowCheck(
    notNull: Array[(Int, String)],
    checks: Array[(String, String, Expression)]) extends Serializable {

  def isEmpty: Boolean = notNull.isEmpty && checks.isEmpty

  def validate(row: InternalRow): Unit = {
    var i = 0
    while (i < notNull.length) {
      val (ord, name) = notNull(i)
      if (ord < row.numFields && row.isNullAt(ord))
        throw new ConstraintViolationException(
          s"NOT NULL constraint violated: column $name is null")
      i += 1
    }
    i = 0
    while (i < checks.length) {
      val (name, sql, e) = checks(i)
      if (e.eval(row) == false)
        throw new ConstraintViolationException(
          s"CHECK constraint $name violated: ($sql) is false for a " +
            "written row")
      i += 1
    }
  }
}

private[sources] object Constraints {

  val FileName = "_constraints"

  def write(dir: Path, c: TableConstraints): Unit = {
    val lines =
      c.notNullIds.toSeq.sorted.map(id => s"notnull\t$id") ++
        c.checks.map(ch => s"check\t${ch.name}\t${ch.sql}")
    val tmp = dir.resolve(FileName + ".inprogress")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, dir.resolve(FileName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dir: Path): TableConstraints = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) TableConstraints()
    else {
      val nn = Set.newBuilder[Long]
      val cks = Vector.newBuilder[CheckConstraint]
      Files.readString(f).split("\n").iterator.filter(_.nonEmpty).foreach {
        line =>
          line.split("\t", 3) match {
            case Array("notnull", id) => nn += id.toLong
            case Array("check", name, sql) => cks += CheckConstraint(name, sql)
            case other => throw new IllegalStateException(
              s"corrupt $FileName line: ${other.mkString("\t")}")
          }
      }
      TableConstraints(nn.result(), cks.result())
    }
  }

  /** Column names a CHECK expression references (unresolved parse) —
    * the dependency set RENAME/DROP COLUMN must respect. */
  def references(sql: String): Set[String] = {
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sql)
    parsed.collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name
    }.toSet
  }

  /** Parse + analyze + bind one CHECK expression against the LOGICAL
    * schema — loud AnalysisException for unknown columns/functions or
    * a non-boolean result. */
  def compile(spark: SparkSession, sql: String,
      logical: StructType): Expression = {
    val attrs: Seq[Attribute] =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(logical)
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    val plan = Filter(parsed, LocalRelation(attrs))
    val analyzed = spark.sessionState.analyzer.execute(plan)
    spark.sessionState.analyzer.checkAnalysis(analyzed)
    val cond = analyzed.asInstanceOf[Filter].condition
    require(cond.dataType == org.apache.spark.sql.types.BooleanType,
      s"CHECK ($sql) must be a boolean predicate, got ${cond.dataType}")
    BindReferences.bindReference(cond, attrs)
  }

  /** Build the task-shippable validator for a table's current
    * constraints, bound to the logical layout. */
  def rowCheck(spark: SparkSession, c: TableConstraints,
      phys: StructType): RowCheck = {
    if (c.isEmpty) return new RowCheck(Array.empty, Array.empty)
    val logical = ColumnMapping.logical(phys)
    val l2p = ColumnMapping.logicalToPhys(phys)
    // field id -> logical ordinal (id-keyed NOT NULL survives rename)
    val nn = c.notNullIds.toArray.sorted.flatMap { id =>
      l2p.indices.find { li =>
        ColumnMapping.fieldId(phys(l2p(li))).contains(id)
      }.map(li => (li, logical(li).name))
    }
    val cks = c.checks.toArray.map(ch =>
      (ch.name, ch.sql, compile(spark, ch.sql, logical)))
    new RowCheck(nn, cks)
  }
}
