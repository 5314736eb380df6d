package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Z-order clustering mechanics: the interleave expression matches
  * the reference bit math, the z-layout's zone maps prune files on
  * BOTH dimensions, single-key clustering demonstrably cannot serve
  * the second dimension, and skipping is result-invisible. The
  * oracle-gated result-invisibility at fixture scale is q133. */
class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = new java.io.File(s"target/graft_test/zorder_$tag")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    if (d.exists()) deleteRec(d)
    d.getAbsolutePath
  }

  // 200x200 uniform grid: both dimensions equally hot
  private def grid = spark.range(0, 40000)
    .select((col("id") % 200).as("a"),
      call_function("div", col("id"), lit(200L)).as("b"),
      col("id").as("payload"))

  private def survivors(path: String, key: String, lo: Long, hi: Long): Int =
    ZoneMap.build(spark, path, key)
      .where(col("hi") >= lo && col("lo") <= hi)
      .count().toInt

  test("column interleave matches the reference bit math") {
    val rows = spark.range(0, 4096)
      .select((col("id") % 64).as("a"),
        call_function("div", col("id"), lit(64L)).as("b"))
      .select(col("a"), col("b"),
        ZOrder.interleaveBits(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.interleaveRef(r.getLong(0), r.getLong(1)))
    }
  }

  test("normalize is a pure-BIGINT affine map; degenerate span maps to zero") {
    val vals = spark.range(0, 100).select(col("id").as("v"))
      .select(ZOrder.normalize(col("v"), 0L, 99L).as("n"),
        ZOrder.normalize(col("v"), 5L, 5L).as("deg"))
      .collect()
    assert(vals.map(_.getLong(0)).min == 0L)
    assert(vals.map(_.getLong(0)).max == (1L << ZOrder.BitsPerDim) - 1)
    assert(vals.forall(_.getLong(1) == 0L))
  }

  test("z-layout prunes files on BOTH dimensions; single-key layout cannot") {
    val zPath = freshDir("z")
    ZOrder.writeClustered(grid, "a", "b", 16, zPath)

    // a quarter-range on either dimension keeps a strip of the 4x4
    // rectangle grid, not the whole table
    val survA = survivors(zPath, "a", 0, 49)
    val survB = survivors(zPath, "b", 0, 49)
    assert(survA < 16, s"a-range must prune z-ordered files, kept $survA/16")
    assert(survB < 16, s"b-range must prune z-ordered files, kept $survB/16")

    // contrast: range-cluster on a alone — a-ranges prune perfectly,
    // b-ranges keep every file (each file spans the whole b domain)
    val aPath = freshDir("single_a")
    ZoneMap.writeClustered(grid, "a", 16, aPath)
    assert(survivors(aPath, "a", 0, 49) <= survA,
      "single-key layout should be at least as tight on its own key")
    assert(survivors(aPath, "b", 0, 49) == 16,
      "single-key layout cannot prune the other dimension")
  }

  test("skipping scan over the z-layout is result-invisible on both dimensions") {
    val zPath = freshDir("res")
    ZOrder.writeClustered(grid, "a", "b", 16, zPath)
    for (key <- Seq("a", "b")) {
      val zmap = ZoneMap.build(spark, zPath, key)
      val got = ZoneMap.skippingScan(spark, zPath, zmap, key, 30L, 90L)
        .agg(count(lit(1)), sum(col("payload"))).head()
      val want = grid.where(col(key).between(30L, 90L))
        .agg(count(lit(1)), sum(col("payload"))).head()
      assert(got == want, s"dimension $key: skipping changed the result")
    }
  }

  test("3-key interleave matches the n-ary reference; all three dims prune") {
    val bits = ZOrder.bitsFor(3)
    val rows = spark.range(0, 4096)
      .select((col("id") % 16).as("a"),
        (call_function("div", col("id"), lit(16L)) % 16).as("b"),
        call_function("div", col("id"), lit(256L)).as("c"))
      .select(col("a"), col("b"), col("c"),
        ZOrder.interleaveBits(Seq(col("a"), col("b"), col("c")), bits).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(3) == ZOrder.interleaveRefN(
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)), bits))
    }
    // 40x40x25 grid, all three dimensions equally hot
    val cube = spark.range(0, 40000)
      .select((col("id") % 40).as("a"),
        (call_function("div", col("id"), lit(40L)) % 40).as("b"),
        call_function("div", col("id"), lit(1600L)).as("c"),
        col("id").as("payload"))
    val path = freshDir("z3")
    ZOrder.writeClustered(cube, Seq("a", "b", "c"), 16, path)
    for (key <- Seq("a", "b", "c")) {
      val surv = survivors(path, key, 0, 9)
      assert(surv < 16, s"$key-range must prune 3-key z-files, kept $surv/16")
      val zmap = ZoneMap.build(spark, path, key)
      val got = ZoneMap.skippingScan(spark, path, zmap, key, 0L, 9L)
        .agg(count(lit(1)), sum(col("payload"))).head()
      val want = cube.where(col(key).between(0L, 9L))
        .agg(count(lit(1)), sum(col("payload"))).head()
      assert(got == want, s"dimension $key: 3-key skipping changed the result")
    }
  }
}
