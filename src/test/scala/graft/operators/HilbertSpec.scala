package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Hilbert clustering mechanics: the unrolled column state machine
  * matches the reference bit math, the curve is a bijection that moves
  * ONE unit cell per step (the locality property Z-order lacks), the
  * layout's zone maps prune on BOTH dimensions, and skipping is
  * result-invisible. The oracle-gated result-invisibility at fixture
  * scale is q210. */
class HilbertSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = new java.io.File(s"target/graft_test/hilbert_$tag")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    if (d.exists()) deleteRec(d)
    d.getAbsolutePath
  }

  private def grid = spark.range(0, 40000)
    .select((col("id") % 200).as("a"),
      call_function("div", col("id"), lit(200L)).as("b"),
      col("id").as("payload"))

  private def survivors(path: String, key: String, lo: Long, hi: Long): Int =
    ZoneMap.build(spark, path, key)
      .where(col("hi") >= lo && col("lo") <= hi)
      .count().toInt

  test("column state machine matches the reference bit math") {
    val n = 1L << Hilbert.BitsPerDim
    val sample = spark.range(0, 4096)
      .select(((col("id") * 37) % n).as("x"), ((col("id") * 101 + 7) % n).as("y"))
    val rows = Hilbert.withIndex(sample, col("x"), col("y")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == Hilbert.indexRef(r.getLong(0), r.getLong(1)))
    }
  }

  test("the curve is a bijection and moves one unit cell per step") {
    val bits = 3
    val side = 1 << bits
    val cells = for (x <- 0 until side; y <- 0 until side)
      yield (Hilbert.indexRef(x, y, bits), (x, y))
    // bijection: every curve position in [0, side^2) exactly once
    assert(cells.map(_._1).sorted == (0 until side * side).map(_.toLong))
    // continuity: consecutive positions are Manhattan-adjacent —
    // the property Morton interleaving does NOT have
    val byD = cells.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump from ($x1,$y1) to ($x2,$y2)")
    }
    // contrast: Morton has at least one non-unit jump on the same grid
    val zByD = (for (x <- 0 until side; y <- 0 until side)
      yield (ZOrder.interleaveRef(x, y, bits), (x, y)))
      .sortBy(_._1).map(_._2)
    assert(zByD.sliding(2).exists { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    })
  }

  test("hilbert layout prunes files on BOTH dimensions") {
    val hPath = freshDir("h")
    Hilbert.writeClustered(grid, "a", "b", 16, hPath)
    val survA = survivors(hPath, "a", 0, 49)
    val survB = survivors(hPath, "b", 0, 49)
    assert(survA < 16, s"a-range must prune hilbert files, kept $survA/16")
    assert(survB < 16, s"b-range must prune hilbert files, kept $survB/16")
  }

  test("skipping over the hilbert layout is result-invisible on both dimensions") {
    val hPath = freshDir("res")
    Hilbert.writeClustered(grid, "a", "b", 16, hPath)
    for (key <- Seq("a", "b")) {
      val zmap = ZoneMap.build(spark, hPath, key)
      val got = ZoneMap.skippingScan(spark, hPath, zmap, key, 30L, 90L)
        .agg(count(lit(1)), sum(col("payload"))).head()
      val want = grid.where(col(key).between(30L, 90L))
        .agg(count(lit(1)), sum(col("payload"))).head()
      assert(got == want, s"dimension $key: skipping changed the result")
    }
  }

  test("n-d Skilling column chain matches the reference for 3 dims") {
    val bits = 4
    val side = 1L << bits
    val sample = spark.range(0, 2048)
      .select(((col("id") * 37) % side).as("x"),
        ((col("id") * 101 + 7) % side).as("y"),
        ((col("id") * 53 + 3) % side).as("z"))
    val rows = Hilbert.withIndexN(sample,
      Seq(col("x"), col("y"), col("z")), bits).collect()
    rows.foreach { r =>
      assert(r.getLong(3) == Hilbert.indexRefN(
        Array(r.getLong(0), r.getLong(1), r.getLong(2)), bits),
        s"(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)})")
    }
  }

  test("the n-d curve is a bijection with unit steps for n = 2, 3, 4") {
    for ((n, bits) <- Seq((2, 4), (3, 3), (4, 2))) {
      val side = 1 << bits
      val total = math.pow(side, n).toLong
      val seen = scala.collection.mutable.Map[Long, Array[Long]]()
      def rec(dims: Int, acc: List[Long]): Unit =
        if (dims == 0) {
          val c = acc.toArray
          seen(Hilbert.indexRefN(c, bits)) = c
        } else (0L until side).foreach(v => rec(dims - 1, v :: acc))
      rec(n, Nil)
      assert(seen.size == total, s"n=$n: not a bijection")
      (1L until total).foreach { h =>
        val l1 = seen(h - 1).zip(seen(h))
          .map { case (a, b) => math.abs(a - b) }.sum
        assert(l1 == 1, s"n=$n: non-unit step at $h")
      }
    }
  }

  test("3-key hilbert layout prunes on all three dimensions, result-invisible") {
    val cube = spark.range(0, 40000)
      .select((col("id") % 40).as("a"),
        (call_function("div", col("id"), lit(40L)) % 40).as("b"),
        call_function("div", col("id"), lit(1600L)).as("c"),
        col("id").as("payload"))
    val path = freshDir("h3")
    Hilbert.writeClustered(cube, Seq("a", "b", "c"), 16, path)
    for (key <- Seq("a", "b", "c")) {
      val surv = survivors(path, key, 0, 9)
      assert(surv < 16, s"$key-range must prune 3-key h-files, kept $surv/16")
      val zmap = ZoneMap.build(spark, path, key)
      val got = ZoneMap.skippingScan(spark, path, zmap, key, 0L, 9L)
        .agg(count(lit(1)), sum(col("payload"))).head()
      val want = cube.where(col(key).between(0L, 9L))
        .agg(count(lit(1)), sum(col("payload"))).head()
      assert(got == want, s"dimension $key: 3-key skipping changed the result")
    }
  }
}
