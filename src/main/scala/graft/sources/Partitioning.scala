package graft.sources

import java.io.{DataInputStream, DataOutputStream}

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table partitioning for the catalog's file-backed data plane — the
  * `PARTITIONED BY` surface every lakehouse format leads with. A
  * partition spec is a list of TRANSFORMS over table columns
  * (identity / days / bucket, the Iceberg partition-transform trio);
  * every data file carries the ONE transform-output tuple all its
  * rows share, and the scan prunes whole files against partition
  * predicates BEFORE it even consults per-file column stats. At
  * 100 TB this is the difference between planning O(matching files)
  * and O(all files): partition pruning needs no statistics, no file
  * footers, and composes with stats skipping and runtime (DPP)
  * filtering on top.
  *
  * Values are Catalyst INTERNAL representations (boxed primitives /
  * UTF8String / date-days ints), the same coin the stats layer uses,
  * so pruning reuses the zone-map comparator with min == max.
  */
private[sources] sealed trait PartTransform {
  /** Source column name. */
  def col: String
  /** Rendered form (`col`, `days(col)`, `bucket(n, col)`). */
  def render: String
  /** Transform output for the column's internal value (null-safe —
    * null input maps to a null partition value, as in the formats). */
  def eval(v: Any, dt: DataType): Any
}

private[sources] final case class PIdentity(col: String)
    extends PartTransform {
  override def render: String = col
  override def eval(v: Any, dt: DataType): Any = v
}

/** Day-granularity time partitioning: DATE columns pass through
  * (internal form already IS days since epoch); TIMESTAMP columns
  * floor-divide their epoch micros — floorDiv, so pre-1970 instants
  * land in the right day. */
private[sources] final case class PDays(col: String) extends PartTransform {
  override def render: String = s"days($col)"
  override def eval(v: Any, dt: DataType): Any = v match {
    case null => null
    case d: java.lang.Integer => d // DateType
    case micros: java.lang.Long =>
      Int.box(Math.floorDiv(micros, Partitioning.MicrosPerDay).toInt)
    case other => throw new IllegalArgumentException(
      s"days($col): unexpected internal value $other")
  }
}

/** Hash bucketing on Spark's own Murmur3 (the HashPartitioning
  * function), pmod into [0, n). */
private[sources] final case class PBucket(n: Int, col: String)
    extends PartTransform {
  override def render: String = s"bucket($n, $col)"
  override def eval(v: Any, dt: DataType): Any =
    if (v == null) null else Int.box(Partitioning.bucketOf(v, dt, n))
}

private[sources] object Partitioning {

  val MicrosPerDay: Long = 86400000000L

  def bucketOf(v: Any, dt: DataType, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(v, dt, 42L)
    (((h % n) + n) % n).toInt
  }

  /** Column types a partition transform accepts: the atomic orderable
    * set the stats/pruning layer serves exactly. */
  private def atomicOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
        DateType | TimestampType | TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Validate a spec against the table schema — loudly, at CREATE. */
  def validate(spec: Seq[PartTransform], schema: StructType): Unit =
    spec.foreach { p =>
      val f = schema.find(_.name == p.col).getOrElse(
        throw new IllegalArgumentException(
          s"partition column ${p.col} not in table schema"))
      p match {
        case PDays(_) => require(
          f.dataType == DateType || f.dataType == TimestampType ||
            f.dataType == TimestampNTZType,
          s"days(${p.col}) needs a DATE/TIMESTAMP column, got ${f.dataType}")
        case PBucket(n, _) =>
          require(n > 0, s"bucket count must be positive, got $n")
          require(atomicOk(f.dataType),
            s"bucket(${p.col}): unsupported type ${f.dataType}")
        case PIdentity(_) => require(atomicOk(f.dataType),
          s"identity partition ${p.col}: unsupported type ${f.dataType}")
      }
    }

  // ---- spec persistence (`_partition` in the table log dir) ---------
  //
  // v1 (pre-evolution): bare transform lines — ONE immutable spec.
  // v2 (spec evolution, the Iceberg model): a `#v2` header, then one
  // `spec <id>` block per spec VERSION; the highest id is the current
  // write spec, older ids stay resolvable because every data file's
  // tuple records the spec id it was written under.

  def renderSpec(spec: Seq[PartTransform]): String =
    spec.map {
      case PIdentity(c) => s"identity\t$c"
      case PDays(c) => s"days\t$c"
      case PBucket(n, c) => s"bucket\t$n\t$c"
    }.mkString("\n")

  def parseSpec(s: String): Seq[PartTransform] =
    s.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      line.split("\t").toSeq match {
        case Seq("identity", c) => PIdentity(c)
        case Seq("days", c) => PDays(c)
        case Seq("bucket", n, c) => PBucket(n.toInt, c)
        case other => throw new IllegalArgumentException(
          s"bad partition spec line: $other")
      }
    }

  def renderSpecsV2(specs: Vector[Seq[PartTransform]]): String =
    "#v2\n" + specs.zipWithIndex.map { case (s, i) =>
      s"spec $i\n" + renderSpec(s)
    }.mkString("\n")

  def isV2(s: String): Boolean = s.startsWith("#v2")

  def parseSpecsV2(s: String): Vector[Seq[PartTransform]] = {
    require(isV2(s), "not a #v2 partition registry")
    val out = Vector.newBuilder[Seq[PartTransform]]
    var cur: Option[scala.collection.mutable.ArrayBuffer[PartTransform]] = None
    s.split("\n").iterator.drop(1).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("spec ")) {
        cur.foreach(b => out += b.toSeq)
        cur = Some(scala.collection.mutable.ArrayBuffer.empty)
      } else cur.getOrElse(throw new IllegalArgumentException(
        s"spec line before any 'spec <id>' header: $line")) ++=
        parseSpec(line)
    }
    cur.foreach(b => out += b.toSeq)
    out.result()
  }

  // ---- SELF-DESCRIBING tuple codec (v2 tables) -----------------------
  // [specId: byte][width: byte][tagged values] — decode never needs
  // the registry, so replay is robust to any crash window around a
  // spec-change publication.

  def writeTagged(out: DataOutputStream, specId: Int,
      vals: Vector[Any]): Unit = {
    require(specId >= 0 && specId <= 127 && vals.length <= 127,
      s"spec id $specId / width ${vals.length} out of byte range")
    out.writeByte(specId)
    out.writeByte(vals.length)
    write(out, vals)
  }

  def readTagged(in: DataInputStream): (Int, Vector[Any]) = {
    val sid = in.readByte().toInt
    val w = in.readByte().toInt
    (sid, read(in, w))
  }

  // ---- partition-tuple wire codec (inside commits/checkpoints) ------
  // tagged, self-describing values; the reader knows the tuple WIDTH
  // from the table's spec

  def write(out: DataOutputStream, vals: Vector[Any]): Unit =
    vals.foreach {
      case null => out.writeByte(0)
      case i: java.lang.Integer => out.writeByte(1); out.writeInt(i)
      case l: java.lang.Long => out.writeByte(2); out.writeLong(l)
      case s: UTF8String => out.writeByte(3); out.writeUTF(s.toString)
      case b: java.lang.Boolean => out.writeByte(4); out.writeBoolean(b)
      case s: java.lang.Short => out.writeByte(5); out.writeShort(s.toInt)
      case b: java.lang.Byte => out.writeByte(6); out.writeByte(b.toInt)
      case other => throw new IllegalArgumentException(
        s"unsupported partition value $other (${other.getClass})")
    }

  def read(in: DataInputStream, n: Int): Vector[Any] =
    Vector.fill(n) {
      in.readByte() match {
        case 0 => null
        case 1 => Int.box(in.readInt())
        case 2 => Long.box(in.readLong())
        case 3 => UTF8String.fromString(in.readUTF())
        case 4 => Boolean.box(in.readBoolean())
        case 5 => Short.box(in.readShort())
        case 6 => Byte.box(in.readByte())
      }
    }

  /** Human-readable `k=v/k=v` rendering (the `.files` surface). */
  def renderVals(spec: Seq[PartTransform], vals: Vector[Any]): String =
    spec.zip(vals).map { case (p, v) =>
      s"${p.render}=${if (v == null) "null" else v.toString}"
    }.mkString("/")

  // ---- file-grain pruning against pushed/runtime predicates ---------

  /** True iff the file's partition tuple PROVES no row can match —
    * evaluated before any per-file stats, footer, or page is touched.
    * Identity and days tuples become exact pseudo-stats (min == max,
    * or the day's micros range) and reuse the zone-map contradiction
    * logic verbatim; bucket tuples refute equality classes (a literal
    * hashing to a different bucket cannot live in this file). Callers
    * must suppress the prune on PATCHED segments — an UPDATE overlay
    * can rewrite the partition column under the file. */
  def contradicts(spec: Seq[PartTransform], vals: Vector[Any],
      schema: StructType, count: Long,
      filters: Seq[org.apache.spark.sql.sources.Filter]): Boolean = {
    if (spec.isEmpty || vals.length != spec.length) return false
    val pseudoCols = spec.zip(vals).flatMap {
      case (p @ (PIdentity(_) | PDays(_)), v) =>
        schema.find(_.name == p.col).map { f =>
          val cs = (p, v) match {
            case (_, null) =>
              ColStats(count, tracked = true, None, None)
            case (PIdentity(_), x) =>
              ColStats(0L, CommitStats.minMaxTracked(f.dataType),
                Some(x), Some(x))
            case (PDays(_), d: java.lang.Integer) => f.dataType match {
              case DateType => ColStats(0L, tracked = true, Some(d), Some(d))
              case _ => ColStats(0L, tracked = true,
                Some(Long.box(d.toLong * MicrosPerDay)),
                Some(Long.box(d.toLong * MicrosPerDay + MicrosPerDay - 1)))
            }
            case _ => ColStats(0L, tracked = false, None, None)
          }
          f.name -> cs
        }
      case _ => None
    }.toMap
    if (pseudoCols.nonEmpty &&
        MemFilters.contradictsStats(Some(CommitStats(count, pseudoCols)),
          schema, filters)) return true
    // bucket refutation: equality-class membership only
    import org.apache.spark.sql.sources._
    spec.zip(vals).exists {
      case (PBucket(n, c), bv) =>
        val dt = schema.find(_.name == c).map(_.dataType)
        filters.exists {
          case EqualTo(a, lit) if a == c && lit != null =>
            dt.flatMap(d => MemFilters.internal(d, lit).map(iv =>
              bv == null || bucketOf(iv, d, n) != bv)).getOrElse(false)
          case In(a, vs) if a == c && vs.nonEmpty =>
            dt.exists { d =>
              val mapped = vs.toSeq.map(l =>
                if (l == null) None else MemFilters.internal(d, l))
              mapped.forall(_.isDefined) &&
                mapped.flatten.forall(iv =>
                  bv == null || bucketOf(iv, d, n) != bv)
            }
          case IsNull(a) if a == c => bv != null
          case IsNotNull(a) if a == c => bv == null
          case _ => false
        }
      case _ => false
    }
  }
}
