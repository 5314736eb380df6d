package graft.operators

import graft.SparkTestBase
import graft.functions.GraftFunctions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(GraftFunctions.vec_dot(col("v"), col("v"))))
  }

  private def seeds = corpus.where(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))

  test("cell-assignment plan is a per-row fold: no Window, no corpus shuffle") {
    val plan = IvfIndex.assignCells(corpus, seeds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // the only exchange allowed is collapsing the tiny centroid frame
    // to its broadcast single row — never a hash exchange of the corpus
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("argmax fold matches the crossJoin+window reference shape, ties included") {
    val ref = corpus.crossJoin(seeds)
      .select(col("vec_id"), col("cid"),
        (GraftFunctions.vec_dot(col("v"), col("cv")) /
          (col("nrm") * col("cnrm"))).as("csim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    val got = IvfIndex.assignCells(corpus, seeds).select(col("vec_id"), col("cid"))
    assert(got.except(ref).count() == 0, "fold assigned cells the window would not")
    assert(ref.except(got).count() == 0, "fold missed cells the window assigns")
  }

  test("Lloyd update moves the seed centroids and keeps assignment total") {
    val n = corpus.count()
    val a0 = IvfIndex.assignCells(corpus, seeds)
    assert(a0.count() == n, "every vector must land in a cell")
    val c1 = IvfIndex.lloydUpdate(a0)
    val moved = c1.as("n").join(seeds.as("s"), col("n.cid") === col("s.cid"))
      .where(col("n.cv") =!= col("s.cv")).count()
    assert(moved > 0, "Lloyd update left every centroid at its seed")
    assert(IvfIndex.assignCells(corpus, c1).count() == n,
      "reassignment after the update must stay total")
  }

  test("built index is deterministic across two builds") {
    val i1 = IvfIndex.build(corpus, seeds, iterations = 2)
      .select(col("vec_id"), col("cid"))
    val i2 = IvfIndex.build(corpus, seeds, iterations = 2)
      .select(col("vec_id"), col("cid"))
    assert(i1.except(i2).count() == 0 && i2.except(i1).count() == 0)
  }

  test("incremental add == rebuild over the union; add-then-delete roundtrips to the original") {
    val cents = IvfIndex.refine(corpus, seeds, iterations = 1)
    val index = IvfIndex.assignCells(corpus, cents)
      .select(col("vec_id"), col("cid"), col("nrm"))
    index.cache()
    val counts = index.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    // arrivals: reversed vectors under offset ids (disjoint, same norm)
    val fresh = corpus.where(col("vec_id") < 40)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("v")).as("v"))
      .withColumn("nrm", sqrt(GraftFunctions.vec_dot(col("v"), col("v"))))
    val additions = IvfIndex.assignCells(fresh, cents)
      .select(col("vec_id"), col("cid"), col("nrm"))
    val (grown, healed) = IvfIndex.addToIndex(index, counts, additions)

    // add == from-scratch assignment of the union (fixed centroids)
    val union = corpus.select(col("vec_id"), col("v"), col("nrm"))
      .unionByName(fresh)
    val rebuilt = IvfIndex.assignCells(union, cents)
      .select(col("vec_id"), col("cid"), col("nrm"))
    assert(grown.except(rebuilt).count() == 0 &&
      rebuilt.except(grown).count() == 0,
      "incremental add diverged from the union rebuild")

    // healed counts == recount of the grown index
    val recount = grown.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    assert(healed.except(recount).count() == 0 &&
      recount.except(healed).count() == 0)

    // roundtrip: deleting exactly the added ids restores the original
    val (back, backCounts) = IvfIndex.deleteFromIndex(grown, healed,
      additions.select(col("vec_id")))
    assert(back.except(index).count() == 0 &&
      index.except(back).count() == 0,
      "add-then-delete is not the identity")
    assert(backCounts.except(counts).count() == 0 &&
      counts.except(backCounts).count() == 0)
  }

  test("tombstone delete: untouched cells pass through, affected cells drop exactly the ids, counts self-heal") {
    val index = IvfIndex.build(corpus, seeds, iterations = 1)
      .select(col("vec_id"), col("cid"), col("nrm")) // payload rides along
    index.cache()
    val counts = index.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    // tombstone every id in cells 0 and 2 with vec_id % 5 == 0, plus
    // one cell killed entirely (all its ids) to hit the dropout path
    val smallest = counts.orderBy(col("n_vecs"), col("cid"))
      .select(col("cid")).head().getLong(0)
    val tomb = index.where(
      (col("cid").isin(0L, 2L) && col("vec_id") % 5 === 0) ||
        col("cid") === smallest)
      .select(col("vec_id"))
    val (newIdx, healed) = IvfIndex.deleteFromIndex(index, counts, tomb)

    // delete == filter over retained ids, row for row (payload intact)
    val expect = index.join(tomb.select(col("vec_id").as("del_id")),
      col("vec_id") === col("del_id"), "left_anti")
    assert(newIdx.except(expect).count() == 0 &&
      expect.except(newIdx).count() == 0,
      "delete diverged from the retained-row filter")

    // untouched cells: every row passes through identically
    val touchedCells = index.join(tomb.withColumnRenamed("vec_id", "del_id"),
      col("vec_id") === col("del_id")).select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSet
    val untouchedGot = newIdx.where(!col("cid").isin(touchedCells.toSeq: _*))
      .collect().map(_.toSeq).toSet
    val untouchedWant = index.where(!col("cid").isin(touchedCells.toSeq: _*))
      .collect().map(_.toSeq).toSet
    assert(untouchedGot == untouchedWant, "untouched cells must pass through")

    // healed counts == recount of the post-delete index; dead cells gone
    val recount = newIdx.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    assert(healed.except(recount).count() == 0 &&
      recount.except(healed).count() == 0,
      "self-healed counts diverged from a recount")
    assert(!healed.collect().map(_.getLong(0)).contains(smallest),
      "a fully-deleted cell must drop out of the stats")
  }
}
