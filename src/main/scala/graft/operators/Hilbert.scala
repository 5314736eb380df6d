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
}
