package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional data
  * skipping. Single-key range clustering ([[ZoneMap.writeClustered]])
  * makes zones tight on ONE column; a filter on any other column
  * still opens every file. Interleaving the bits of two normalized
  * keys orders the table along a space-filling curve, so each output
  * file covers a small RECTANGLE of the (a, b) domain and per-file
  * min/max zone maps prune files for range predicates on EITHER
  * column — this is what OPTIMIZE ... ZORDER BY (a, b) does in
  * lakehouse table formats.
  *
  * Spark-first shape, all three stages declarative:
  *   1. bounds: one aggregate for min/max of both keys — 4 longs of
  *      driver-side planning metadata.
  *   2. z value: pure per-row bit arithmetic (shift/and/or), codegen'd
  *      in the scan stage projection — no UDF.
  *   3. layout: `repartitionByRange(_z) + sortWithinPartitions(_z)` —
  *      the one (unavoidable) range exchange every clustering rewrite
  *      pays, then the zone maps are the standard [[ZoneMap.build]]
  *      one-pass aggregates on the rewritten files.
  *
  * 16 bits per dimension (z fits in 32 bits) is plenty: at 10⁵ files
  * a dimension only needs enough resolution to separate ~√(10⁵) ≈ 320
  * rectangle edges; 65536 cells per axis leaves two orders of margin.
  */
object ZOrder {

  val BitsPerDim = 16

  /** Morton interleave of the low [[BitsPerDim]] bits: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Inputs must already
    * be normalized into [0, 2^bits). */
  def interleaveBits(a: Column, b: Column, bits: Int = BitsPerDim): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Affine map of `[lo, hi]` onto `[0, 2^bits)` in pure BIGINT
    * arithmetic — `div` (IntegralDivide), never `/` (Spark's `/` is
    * double division, which both changes the type and loses exactness
    * past 2^53). A degenerate span maps everything to 0.
    *
    * Multiply-then-divide is exact but only safe while
    * `span * (2^bits - 1)` fits in a Long; past that (span >
    * Long.MaxValue >> bits, ~1.4e15 at 16 bits) the non-ANSI multiply
    * would silently wrap and corrupt z-values. Huge spans instead take
    * a divide-first path — quantize into equal-width cells of
    * `ceil(span / 2^bits)` — which loses only sub-cell placement, not
    * ordering, and can never overflow. */
  def normalize(c: Column, lo: Long, hi: Long, bits: Int = BitsPerDim): Column =
    if (hi <= lo) lit(0L)
    else {
      val span = hi - lo // may wrap negative when the data spans > Long.MaxValue
      val shifted = c.cast("long") - lit(lo)
      if (span > 0 && span <= (Long.MaxValue >> bits))
        call_function("div", shifted * lit((1L << bits) - 1), lit(span))
      else
        // greatest() floors the one remaining wrap case (span itself
        // overflowed AND c - lo wrapped): those rows collapse into
        // cell 0 — degraded clustering for them, never a wrong result
        // (zone maps are rebuilt from the actual rewritten files)
        call_function("div", greatest(shifted, lit(0L)),
          lit(java.lang.Long.divideUnsigned(span, 1L << bits) + 1))
    }

  /** Bits per dimension for an n-key interleave: the full
    * [[BitsPerDim]] while n·bits fits a Long's 62 usable bits, scaled
    * down past that (4 keys -> 15 bits, 6 keys -> 10, ...). Resolution
    * per axis stays far above the √files rectangle-edge bound. */
  def bitsFor(n: Int): Int = math.min(BitsPerDim, 62 / n)

  /** N-ary Morton interleave: bit i of key j lands at position
    * i·n + j (real `OPTIMIZE ZORDER BY` takes a COLUMN LIST, not a
    * pair). Inputs must already be normalized into [0, 2^bits). */
  def interleaveBits(keys: Seq[Column], bits: Int): Column = {
    val n = keys.length
    require(n >= 2 && n * bits <= 62, s"$n keys at $bits bits overflow a Long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      keys.zipWithIndex.foldLeft(acc) { case (a, (k, j)) =>
        a.bitwiseOR(
          shiftleft(shiftright(k, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Reference implementation of the interleave for tests. */
  private[graft] def interleaveRef(a: Long, b: Long, bits: Int = BitsPerDim): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  /** N-ary reference for tests. */
  private[graft] def interleaveRefN(ks: Seq[Long], bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      ks.zipWithIndex.foldLeft(acc) { case (a, (k, j)) =>
        a | (((k >> i) & 1L) << (i * ks.length + j))
      }
    }

  /** Z-order-clustered rewrite of `df` by (`keyA`, `keyB`) into
    * ~`numFiles` files. After the write, persist zone maps for BOTH
    * keys ([[ZoneMap.persist]]) — each file now spans a tight
    * rectangle, so both maps prune. */
  def writeClustered(df: DataFrame, keyA: String, keyB: String,
      numFiles: Int, path: String): Unit =
    writeClustered(df, Seq(keyA, keyB), numFiles, path)

  /** The COLUMN-LIST form (d >= 2 — `OPTIMIZE ... ZORDER BY (a, b, c)`):
    * one bounds aggregate over all keys (2·d longs of planning
    * metadata), one interleaved curve value per row at [[bitsFor]]
    * resolution, one range exchange. Each output file covers a tight
    * d-dimensional BOX, so a zone map on ANY of the keys prunes. */
  def writeClustered(df: DataFrame, keys: Seq[String], numFiles: Int,
      path: String): Unit = {
    require(keys.length >= 2, "Z-order needs at least 2 keys")
    val bits = bitsFor(keys.length)
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).cast("long"), max(col(k)).cast("long")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val normed = keys.zipWithIndex.map { case (k, j) =>
      normalize(col(k), bounds.getLong(2 * j), bounds.getLong(2 * j + 1), bits)
    }
    df.withColumn("_z", interleaveBits(normed, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
