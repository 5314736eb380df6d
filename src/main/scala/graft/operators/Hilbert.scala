package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the locality-preserving alternative to
  * [[ZOrder]]. Morton interleaving has long diagonal jumps (cell
  * 0x0FFF → 0x1000 teleports across the plane), so a file of
  * contiguous z-values can span two distant rectangles; the Hilbert
  * curve moves ONE unit cell per step, so every run of consecutive
  * curve positions is a single connected blob — tighter per-file
  * min/max envelopes on both dimensions, which is why lakehouse
  * OPTIMIZE implementations offer Hilbert next to Z-order.
  *
  * Spark-first shape, same three stages as [[ZOrder.writeClustered]]:
  * one min/max bounds aggregate, a per-row integer curve index, and
  * the one range exchange every clustering rewrite pays. The curve
  * index is the classic bit-level state machine (rx/ry quadrant bits,
  * reflect+swap rotation — Hamilton's algorithm as given in Wikipedia
  * "Hilbert curve", public domain): each of the [[BitsPerDim]] levels
  * is emitted as its OWN projection (`withColumns` per level) so the
  * rotated x/y state is materialized per level instead of nesting —
  * the expression stays linear in levels, codegen-friendly, no UDF.
  *
  * 8 bits per dimension (256×256 cells, curve index < 2^16): a
  * dimension only needs enough resolution to separate ~√files
  * rectangle edges (the [[ZOrder]] argument); 256 edges per axis
  * covers 10⁴+ files with margin, and fewer levels keeps the unrolled
  * state machine compact.
  */
object Hilbert {

  val BitsPerDim = 8

  /** Append `_h` = Hilbert curve index of (`xc`, `yc`) (both already
    * normalized into [0, 2^bits)) to `df`, one projection per level. */
  def withIndex(df: DataFrame, xc: Column, yc: Column,
      bits: Int = BitsPerDim): DataFrame = {
    var cur = df.withColumn("_hx", xc.cast("long"))
      .withColumn("_hy", yc.cast("long"))
      .withColumn("_h", lit(0L))
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = when(col("_hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("_hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      cur = cur
        .withColumn("_rx", rx).withColumn("_ry", ry)
        .withColumn("_h",
          col("_h") + lit(s * s) * (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        // rotation: ry=0 reflects (when rx=1) then swaps x and y
        .withColumn("_nx", when(col("_ry") === 0,
          when(col("_rx") === 1, lit(s - 1) - col("_hy"))
            .otherwise(col("_hy"))).otherwise(col("_hx")))
        .withColumn("_ny", when(col("_ry") === 0,
          when(col("_rx") === 1, lit(s - 1) - col("_hx"))
            .otherwise(col("_hx"))).otherwise(col("_hy")))
        .withColumn("_hx", col("_nx")).withColumn("_hy", col("_ny"))
        .drop("_nx", "_ny", "_rx", "_ry")
      s >>= 1
    }
    cur.drop("_hx", "_hy")
  }

  /** Reference implementation for tests (same algorithm, plain Scala). */
  private[graft] def indexRef(x0: Long, y0: Long, bits: Int = BitsPerDim): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        val (nx, ny) =
          if (rx == 1) (s - 1 - y, s - 1 - x) else (y, x)
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }

  // ---- d >= 2: Skilling's transform -----------------------------------
  //
  // The 2-d state machine above doesn't generalize; the standard
  // n-dimensional construction is Skilling's transform (John Skilling,
  // "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  // public-domain algorithm every n-d Hilbert library implements):
  // per bit level, conditionally exchange/invert the low bits of
  // coordinate 0 against each coordinate (AxesToTranspose), then
  // Gray-encode across coordinates; the curve index is the bit-
  // interleave of the transposed coordinates. HilbertSpec verifies the
  // real curve properties — bijectivity and UNIT STEPS (consecutive
  // indexes differ by exactly 1 in exactly one coordinate) — for
  // n = 2, 3, 4.

  /** N-dimensional reference (plain Scala, Skilling's transform). */
  private[graft] def indexRefN(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = coords.clone()
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var h = 0L
    var lev = bits - 1
    while (lev >= 0) {
      var j = 0
      while (j < n) { h = (h << 1) | ((x(j) >> lev) & 1L); j += 1 }
      lev -= 1
    }
    h
  }

  /** Append `_h` = n-dimensional Hilbert index of `coords` (each
    * already normalized into [0, 2^bits)) — Skilling's transform as a
    * chain of per-level column projections, same codegen-friendly
    * unrolling discipline as the 2-d [[withIndex]]: every conditional
    * exchange is a `when` over the previous level's materialized
    * state, no UDF anywhere. */
  def withIndexN(df: DataFrame, coords: Seq[Column],
      bits: Int = BitsPerDim): DataFrame = {
    val n = coords.length
    require(n >= 2 && n * bits <= 62,
      s"$n dims at $bits bits overflow a Long")
    var cur = df
    coords.zipWithIndex.foreach { case (c, j) =>
      cur = cur.withColumn(s"_g$j", c.cast("long"))
    }
    // AxesToTranspose: per level, exchange/invert against coord 0
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        val cond = col(s"_g$i").bitwiseAND(lit(q)) =!= 0
        if (i == 0)
          cur = cur.withColumn("_g0",
            when(cond, col("_g0").bitwiseXOR(lit(p))).otherwise(col("_g0")))
        else {
          val t = col("_g0").bitwiseXOR(col(s"_g$i")).bitwiseAND(lit(p))
          // one projection per exchange: both updates read the PRE-
          // update state (withColumns, not chained withColumn)
          cur = cur.withColumns(Map(
            "_g0" -> when(cond, col("_g0").bitwiseXOR(lit(p)))
              .otherwise(col("_g0").bitwiseXOR(t)),
            s"_g$i" -> when(cond, col(s"_g$i"))
              .otherwise(col(s"_g$i").bitwiseXOR(t))))
        }
      }
      q >>= 1
    }
    // Gray encode across coordinates (sequential on the updated values)
    for (i <- 1 until n)
      cur = cur.withColumn(s"_g$i",
        col(s"_g$i").bitwiseXOR(col(s"_g${i - 1}")))
    // fold t from the last coordinate's bits, apply to every coordinate
    val tFold = (1 until bits).foldLeft(lit(0L)) { (acc, lev) =>
      val qv = 1L << lev
      acc.bitwiseXOR(
        when(col(s"_g${n - 1}").bitwiseAND(lit(qv)) =!= 0, lit(qv - 1))
          .otherwise(lit(0L)))
    }
    cur = cur.withColumn("_gt", tFold)
    for (i <- 0 until n)
      cur = cur.withColumn(s"_g$i", col(s"_g$i").bitwiseXOR(col("_gt")))
    // untranspose: level bits of each coordinate interleave MSB-first
    val h = (0 until bits).reverse.foldLeft(lit(0L)) { (acc, lev) =>
      (0 until n).foldLeft(acc) { (a, j) =>
        shiftleft(a, 1).bitwiseOR(
          shiftright(col(s"_g$j"), lev).bitwiseAND(lit(1L)))
      }
    }
    cur.withColumn("_h", h)
      .drop((0 until n).map(j => s"_g$j") :+ "_gt": _*)
  }

  /** Hilbert-clustered rewrite of `df` by (`keyA`, `keyB`) into
    * ~`numFiles` files — the [[ZOrder.writeClustered]] contract with
    * the curve swapped. Zone maps built on the rewritten files prune
    * range predicates on EITHER key. */
  def writeClustered(df: DataFrame, keyA: String, keyB: String,
      numFiles: Int, path: String): Unit = {
    val Row(loA: Long, hiA: Long, loB: Long, hiB: Long) = df.agg(
      min(col(keyA)).cast("long"), max(col(keyA)).cast("long"),
      min(col(keyB)).cast("long"), max(col(keyB)).cast("long")).head()
    withIndex(df,
      ZOrder.normalize(col(keyA), loA, hiA, BitsPerDim),
      ZOrder.normalize(col(keyB), loB, hiB, BitsPerDim))
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
      .write.mode("overwrite").parquet(path)
  }

  /** The COLUMN-LIST form (d >= 2): normalize each key, index along
    * the n-dimensional curve ([[withIndexN]]), one range exchange.
    * Every run of consecutive curve positions is one connected
    * d-dimensional blob, so a zone map on ANY key prunes. */
  def writeClustered(df: DataFrame, keys: Seq[String], numFiles: Int,
      path: String): Unit = {
    require(keys.length >= 2, "Hilbert needs at least 2 keys")
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).cast("long"), max(col(k)).cast("long")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val normed = keys.zipWithIndex.map { case (k, j) =>
      ZOrder.normalize(col(k), bounds.getLong(2 * j),
        bounds.getLong(2 * j + 1), BitsPerDim)
    }
    withIndexN(df, normed, BitsPerDim)
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
      .write.mode("overwrite").parquet(path)
  }
}
