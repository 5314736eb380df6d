package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based contract of the self-healing stats fold: for ANY
  * snapshot and ANY row-level delta over it,
  * `CommitStats.applyDelta(prev, ...) == CommitStats.of(result)` —
  * the incremental heal must be indistinguishable from a rescan,
  * including the rescan-on-extremal-removal branch, all-NULL columns,
  * full-table deletion, and prefix-arity (pre-ADD-COLUMN) rows. */
object CommitStatsProps extends Properties("CommitStats") {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType), // untracked min/max type
    StructField("late", LongType))) // candidates may omit it (arity 3)

  /** A row: nullable long, nullable short string, nullable double;
    * ~1/4 of rows carry the historical 3-field arity. */
  private val rowGen: Gen[InternalRow] = for {
    k <- Gen.option(Gen.choose(-50L, 50L))
    s <- Gen.option(Gen.oneOf("a", "bb", "ccc", "zz"))
    d <- Gen.option(Gen.choose(-5.0, 5.0))
    late <- Gen.option(Gen.choose(0L, 9L))
    wide <- Gen.choose(0, 3).map(_ > 0)
  } yield {
    val sv = s.map(UTF8String.fromString).orNull
    if (wide)
      new GenericInternalRow(Array[Any](k.map(Long.box).orNull, sv,
        d.map(Double.box).orNull, late.map(Long.box).orNull))
    else
      new GenericInternalRow(Array[Any](k.map(Long.box).orNull, sv,
        d.map(Double.box).orNull))
  }

  private val snapshotGen: Gen[Vector[InternalRow]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, rowGen)).map(_.toVector)

  private def deltaGen(n: Int): Gen[(Vector[Long], Vector[(Long, InternalRow)],
      Vector[InternalRow])] = for {
    positions <- Gen.someOf(0L until n.toLong)
    shuffled <- Gen.const(positions.toVector)
    split <- Gen.choose(0, shuffled.length)
    updRows <- Gen.listOfN(shuffled.length - split, rowGen)
    inserts <- Gen.choose(0, 10).flatMap(m => Gen.listOfN(m, rowGen))
  } yield (shuffled.take(split),
    shuffled.drop(split).zip(updRows),
    inserts.toVector)

  property("applyDelta == full rescan of the result, for any delta") =
    forAll(snapshotGen) { prev =>
      forAll(deltaGen(prev.length)) { case (dels, upds, ins) =>
        val d = VRowDelta(dels, upds, ins)
        val result = VDelta.apply(prev, d)
        val healed = CommitStats.applyDelta(
          CommitStats.of(prev, schema), schema, prev, d, result)
        val rescanned = CommitStats.of(result, schema)
        // write-order flags are a FILE fact (the order rows were
        // streamed), not a content fact: a delta-maintained snapshot
        // never claims one, so compare everything else
        def noOrder(s: CommitStats): CommitStats = CommitStats(s.count,
          s.cols.view.mapValues(
            _.copy(sortedAsc = false, sortedDesc = false)).toMap)
        val ok = noOrder(healed) == noOrder(rescanned)
        if (!ok) println(s"healed=$healed\nrescan=$rescanned")
        ok
      }
    }
}
