package graft.sources

import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Translate the catalog's pushed V1 filters into parquet-mr
  * `FilterPredicate`s so the reader skips work INSIDE a surviving data
  * file: row-group statistics, dictionary pages, the page index
  * (column-index page skipping), and record-level assembly all engage
  * below `FilterCompat.get`. At 100 TB this is the last scan lever —
  * file-grain pruning (partition tuples + per-file stats) decides
  * which files to open; this decides how few pages of each opened
  * file get decoded.
  *
  * The translation is SOUND-SUPERSET by construction: any conjunct
  * that cannot be expressed (unsupported type, column absent from the
  * file, cross-type literal) is simply dropped — parquet then returns
  * a superset of the matching rows and the reader's residual
  * `MemFilters.eval` applies full SQL semantics. Columns are addressed
  * by their FILE footer names (the caller passes the column-mapping
  * translation), and a predicate is only emitted for columns the file
  * actually contains — parquet-mr validates predicate columns against
  * the file schema and would otherwise throw.
  *
  * Reference analog: the host engine's scanner-level min/max and
  * dictionary filtering (Impala's parquet scanner; Spark's own
  * `ParquetFilters`), re-expressed over the public parquet-mr
  * `FilterApi` because this codec runs sessionless on executors. */
private[sources] object ParquetFilterBridge {

  /** Per-type predicate factory over one parquet column. `v` is the
    * Catalyst INTERNAL value ([[MemFilters.internal]]'s coin). */
  private sealed trait ColOps {
    def eq(v: Any): FilterPredicate
    def notEq(v: Any): FilterPredicate
    def gt(v: Any): FilterPredicate
    def gtEq(v: Any): FilterPredicate
    def lt(v: Any): FilterPredicate
    def ltEq(v: Any): FilterPredicate
    /** eq(null) = IS NULL, notEq(null) = IS NOT NULL (parquet-mr's
      * documented null semantics for eq/notEq). */
    def isNull: FilterPredicate = eq(null)
    def isNotNull: FilterPredicate = notEq(null)
    /** Ordered comparisons never make sense against null. */
    def ordered: Boolean = true
  }

  private final class IntOps(name: String) extends ColOps {
    private val c = FilterApi.intColumn(name)
    private def j(v: Any): java.lang.Integer = v match {
      case null => null
      case i: java.lang.Integer => i
      case s: java.lang.Short => Int.box(s.toInt)
      case b: java.lang.Byte => Int.box(b.toInt)
      case other => throw new IllegalArgumentException(other.toString)
    }
    def eq(v: Any): FilterPredicate = FilterApi.eq(c, j(v))
    def notEq(v: Any): FilterPredicate = FilterApi.notEq(c, j(v))
    def gt(v: Any): FilterPredicate = FilterApi.gt(c, j(v))
    def gtEq(v: Any): FilterPredicate = FilterApi.gtEq(c, j(v))
    def lt(v: Any): FilterPredicate = FilterApi.lt(c, j(v))
    def ltEq(v: Any): FilterPredicate = FilterApi.ltEq(c, j(v))
  }

  private final class LongOps(name: String) extends ColOps {
    private val c = FilterApi.longColumn(name)
    private def j(v: Any): java.lang.Long =
      if (v == null) null else v.asInstanceOf[java.lang.Long]
    def eq(v: Any): FilterPredicate = FilterApi.eq(c, j(v))
    def notEq(v: Any): FilterPredicate = FilterApi.notEq(c, j(v))
    def gt(v: Any): FilterPredicate = FilterApi.gt(c, j(v))
    def gtEq(v: Any): FilterPredicate = FilterApi.gtEq(c, j(v))
    def lt(v: Any): FilterPredicate = FilterApi.lt(c, j(v))
    def ltEq(v: Any): FilterPredicate = FilterApi.ltEq(c, j(v))
  }

  private final class BinOps(name: String) extends ColOps {
    private val c = FilterApi.binaryColumn(name)
    private def j(v: Any): Binary = v match {
      case null => null
      case u: org.apache.spark.unsafe.types.UTF8String =>
        Binary.fromConstantByteArray(u.getBytes)
      case other => throw new IllegalArgumentException(other.toString)
    }
    def eq(v: Any): FilterPredicate = FilterApi.eq(c, j(v))
    def notEq(v: Any): FilterPredicate = FilterApi.notEq(c, j(v))
    def gt(v: Any): FilterPredicate = FilterApi.gt(c, j(v))
    def gtEq(v: Any): FilterPredicate = FilterApi.gtEq(c, j(v))
    def lt(v: Any): FilterPredicate = FilterApi.lt(c, j(v))
    def ltEq(v: Any): FilterPredicate = FilterApi.ltEq(c, j(v))
  }

  private final class BoolOps(name: String) extends ColOps {
    private val c = FilterApi.booleanColumn(name)
    private def j(v: Any): java.lang.Boolean =
      if (v == null) null else v.asInstanceOf[java.lang.Boolean]
    def eq(v: Any): FilterPredicate = FilterApi.eq(c, j(v))
    def notEq(v: Any): FilterPredicate = FilterApi.notEq(c, j(v))
    def gt(v: Any): FilterPredicate = throw new UnsupportedOperationException
    def gtEq(v: Any): FilterPredicate = throw new UnsupportedOperationException
    def lt(v: Any): FilterPredicate = throw new UnsupportedOperationException
    def ltEq(v: Any): FilterPredicate = throw new UnsupportedOperationException
    override def ordered: Boolean = false
  }

  import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  /** Ops for one (Spark type, FILE physical type) pair — the physical
    * type must match what the predicate declares or parquet-mr throws
    * (e.g. a legacy INT96 timestamp cannot take an int64 predicate),
    * and an int64 timestamp must be MICROS or the comparison scale is
    * wrong. */
  private def opsFor(dt: DataType, filePrim: Option[PrimitiveType],
      fileName: String): Option[ColOps] =
    (dt, filePrim.map(_.getPrimitiveTypeName)) match {
      case (IntegerType | DateType | ShortType | ByteType, Some(INT32)) =>
        Some(new IntOps(fileName))
      case (LongType, Some(INT64)) => Some(new LongOps(fileName))
      case (TimestampType | TimestampNTZType, Some(INT64))
        if isMicros(filePrim.get) => Some(new LongOps(fileName))
      case (StringType, Some(BINARY)) => Some(new BinOps(fileName))
      case (BooleanType, Some(BOOLEAN)) => Some(new BoolOps(fileName))
      case _ => None // type mismatch / float/double/decimal: residual-only
    }

  private def isMicros(p: PrimitiveType): Boolean =
    p.getLogicalTypeAnnotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
      case _ => false
    }

  /** Build the conjunction of every translatable pushed filter, or
    * None when nothing translates (the reader then runs unfiltered
    * and the residual does all the work — never wrong, just slower).
    *
    * @param schema   layout the filters' column names resolve in (the
    *                 pruned file-read schema, REQUESTED names)
    * @param nameMap  requested name -> file footer name (column
    *                 mapping translation; identity when unmapped)
    * @param fileCols top-level column names present in the file's
    *                 footer — predicates on absent columns are dropped
    */
  def build(schema: StructType, nameMap: Map[String, String],
      fileCols: Set[String],
      filePrims: Map[String, PrimitiveType],
      filters: Seq[Filter]): Option[FilterCompat.Filter] = {
    def col(name: String): Option[(DataType, ColOps)] = {
      val fn = nameMap.getOrElse(name, name)
      if (!fileCols.contains(fn)) None
      else schema.fields.find(_.name == name)
        .flatMap(f => opsFor(f.dataType, filePrims.get(fn), fn)
          .map(o => (f.dataType, o)))
    }
    def one(f: Filter): Option[FilterPredicate] = f match {
      case EqualTo(a, v) => for {
        (dt, o) <- col(a)
        iv <- MemFilters.internal(dt, v)
      } yield o.eq(iv)
      case EqualNullSafe(a, null) => col(a).map(_._2.isNull)
      case EqualNullSafe(a, v) => for {
        (dt, o) <- col(a)
        iv <- MemFilters.internal(dt, v)
      } yield o.eq(iv)
      case GreaterThan(a, v) => cmpPred(a, v)(_.gt(_))
      case GreaterThanOrEqual(a, v) => cmpPred(a, v)(_.gtEq(_))
      case LessThan(a, v) => cmpPred(a, v)(_.lt(_))
      case LessThanOrEqual(a, v) => cmpPred(a, v)(_.ltEq(_))
      case In(a, vs) if vs.nonEmpty => col(a).flatMap { case (dt, o) =>
        val ivs = vs.toSeq.map(v =>
          if (v == null) None else MemFilters.internal(dt, v))
        if (ivs.exists(_.isEmpty)) None
        else Some(ivs.flatten.map(o.eq)
          .reduceLeft[FilterPredicate](FilterApi.or))
      }
      case IsNull(a) => col(a).map(_._2.isNull)
      case IsNotNull(a) => col(a).map(_._2.isNotNull)
      case _ => None
    }
    def cmpPred(a: String, v: Any)(
        mk: (ColOps, Any) => FilterPredicate): Option[FilterPredicate] =
      for {
        (dt, o) <- col(a) if o.ordered
        iv <- MemFilters.internal(dt, v)
      } yield mk(o, iv)

    val preds = filters.flatMap(one)
    if (preds.isEmpty) None
    else Some(FilterCompat.get(
      preds.reduceLeft[FilterPredicate](FilterApi.and)))
  }

  /** The raw [[FilterPredicate]] (no FilterCompat wrap) — what
    * `ParquetInputFormat.setFilterPredicate` wants for the VECTORIZED
    * reader's conf-driven row-group + page-index skipping. */
  def buildPredicate(schema: StructType, nameMap: Map[String, String],
      fileCols: Set[String],
      filePrims: Map[String, PrimitiveType],
      filters: Seq[Filter]): Option[FilterPredicate] =
    build(schema, nameMap, fileCols, filePrims, filters).collect {
      case f: FilterCompat.FilterPredicateCompat => f.getFilterPredicate
    }
}
