package graft.queries

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class NearDupSpec extends SparkTestBase {

  test("candidate-pair plan is a band equi-join: no cartesian product") {
    val plan = NearDupQueries.candidatePairs(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("edit-distance verify stays on the candidate set and its plan never goes quadratic") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q131_editdist_neardup")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture's planted near-dups must survive the edit threshold")
    // every verified pair is an LSH candidate and honors 5*dist <= max_len
    val cand = NearDupQueries.candidatePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(cand.contains((r.getLong(0), r.getLong(1))))
      assert(r.getInt(2) * 5 <= r.getLong(3))
    }
  }

  test("LSH finds a planted near-duplicate and skips unrelated docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"other$i").mkString(" ")
    Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/neardup_fixture/documents.parquet")

    val pairs = NearDupQueries.candidatePairs(spark, "/tmp/neardup_fixture")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc produced a candidate: $pairs")
  }

  test("bucket cap drops a degenerate bucket instead of exploding quadratically") {
    import spark.implicits._
    // 20 identical docs -> every band bucket holds all 20 -> 190 pairs uncapped
    (1L to 20L).map(i => (i, "x y z w v u t s"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/neardup_degen/documents.parquet")
    val uncapped = NearDupQueries.candidatePairs(spark, "/tmp/neardup_degen").count()
    assert(uncapped == 190L, s"expected 20*19/2 pairs, got $uncapped")
    val capped = NearDupQueries.candidatePairs(spark, "/tmp/neardup_degen",
      maxBucketSize = 10).count()
    assert(capped == 0L, s"capped run must drop the degenerate bucket, got $capped")
  }

  test("identical docs share a full signature; disjoint docs share no band") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6"
    Seq((1L, a), (2L, a), (3L, "z1 z2 z3 z4 z5 z6"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/neardup_fixture2/documents.parquet")
    val pairs = NearDupQueries.candidatePairs(spark, "/tmp/neardup_fixture2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("clusters collapse a transitive chain whose endpoints are not a pair") {
    import spark.implicits._
    // a~b and b~c are verified near-dups (2 changed tokens, J=0.81);
    // a vs c differ in 4 tokens (J=0.66 < 0.7) -> never a direct pair,
    // yet all three must land in doc 1's cluster transitively
    val base = (1 to 60).map(i => s"tok$i").toVector
    val a = base.mkString(" ")
    val b = base.updated(9, "B1").updated(19, "B2").mkString(" ")
    val c = base.updated(9, "B1").updated(19, "B2")
      .updated(29, "C1").updated(39, "C2").mkString(" ")
    val far = (200 to 260).map(i => s"other$i").mkString(" ")
    Seq((1L, a), (2L, b), (3L, c), (9L, far))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/neardup_chain/documents.parquet")

    val pairSet = NearDupQueries.verifiedPairs(spark, "/tmp/neardup_chain")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet == Set((1L, 2L), (2L, 3L)),
      s"expected exactly the chain pairs, got $pairSet")

    val clusters = NearDupQueries.nearDupClusters(spark, "/tmp/neardup_chain")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"chain must collapse into doc 1's cluster, got $clusters")
  }

  test("star contraction converges in O(log n) rounds on a 1000-node chain") {
    import spark.implicits._
    // the adversarial case for label propagation: a path graph of
    // diameter 999 needs ~1000 propagation rounds, but large/small-star
    // contraction must finish in <= 2*log2(n) alternations
    val n = 1000
    val chain = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = NearDupQueries.ccStarContraction(chain)
    val bound = 2 * (math.log(n) / math.log(2)).ceil.toInt
    assert(rounds <= bound, s"took $rounds alternations, bound is $bound")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n)
    assert(got.forall(_._2 == 1L),
      s"every chain node must label to 1, got ${got.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("local union-find and star contraction produce identical labels") {
    import spark.implicits._
    // deterministic pseudo-random graph: 400 nodes, ~300 edges, many
    // components of varied shape (chains, merges, isolated self-pairs)
    val edges = (0 until 300).map { i =>
      val a = (i * 2654435761L) % 400
      val b = (i * 40503L + 7) % 400
      (a, b)
    }.toDF("doc_a", "doc_b")
    val local = NearDupQueries.ccLocalUnionFind(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = NearDupQueries.ccStarContraction(edges)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local == star, s"paths disagree: ${
      local.toSet.diff(star.toSet).take(5)} / ${star.toSet.diff(local.toSet).take(5)}")
  }

  test("the size dispatch honors the local-CC threshold conf") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    val got = NearDupQueries.clustersFromPairs(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
    // threshold 0 forces the distributed path; labels must not change
    spark.conf.set(NearDupQueries.LocalCcThresholdKey, "0")
    try {
      val distributed = NearDupQueries.clustersFromPairs(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(distributed == expect)
    } finally spark.conf.unset(NearDupQueries.LocalCcThresholdKey)
  }

  test("star contraction labels multiple components, isolated self-pairs, and reversed edges") {
    import spark.implicits._
    // two components with mixed edge orientation + one self-pair node
    val pairs = Seq((5L, 3L), (3L, 7L), (20L, 10L), (42L, 42L))
      .toDF("doc_a", "doc_b")
    val (labels, _) = NearDupQueries.ccStarContraction(pairs)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 3L,
      10L -> 10L, 20L -> 10L, 42L -> 42L), s"got $got")
  }

  test("q217: pair counts decrease monotonically; the 70% point is q23's set") {
    val curve = graft.SparkEntry.queries("q217_threshold_curve")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(curve.keySet == Set(50L, 60L, 70L, 80L, 90L))
    val ordered = curve.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sortBy(-_), s"not monotone: $ordered")
    val q23n = graft.SparkEntry.queries("q23_neardup_pairs")(spark, sf0001).count()
    assert(curve(70L) == q23n,
      s"sweep at 70% (${curve(70L)}) must equal q23's pair count ($q23n)")
  }

  test("q256: b-bit estimates are sane and the plan stays equi-joined") {
    val df = graft.SparkEntry.queries("q256_bbit_minhash")(spark, sf0001)
    val rows = df.collect().map(r => (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (kAgree, bAgree, estBp, jacBp) =>
      // 4-bit agreement can only ADD accidental collisions
      assert(bAgree >= kAgree, s"b-bit agreement below full-width: $rows")
      assert(estBp >= 0 && estBp <= 10000 && jacBp >= 0 && jacBp <= 10000)
    }
    // the fixture's candidates are true near-dups: the corrected
    // estimate tracks the exact Jaccard within the k=16 resolution
    // (one component = 625 bp) plus the b-bit correction slack
    rows.foreach { case (_, _, estBp, jacBp) =>
      assert(math.abs(estBp - jacBp) <= 2500,
        s"estimate drifted: est=$estBp exact=$jacBp")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
