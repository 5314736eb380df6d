package graft.queries

import graft.SparkTestBase
import graft.functions.{PiiScrub, RepetitionStats}
import graft.operators.{Decontaminate, DomainMix, SemanticDedup}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Unit semantics + plan-shape pins for the curation operators
  * (q116-q120). The oracle gates prove values; these prove the SCALE
  * shapes — broadcast where a side is small, map-only where the work
  * is per-row, and never a cartesian anywhere. */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private def defOf(name: String): QueryDef =
    CurationQueries.defs.find(_.name == name).get

  private def executed(name: String): SparkPlan = {
    val df = defOf(name).run(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan
  }

  private def countNodes(p: SparkPlan)(f: PartialFunction[SparkPlan, Unit]): Int =
    p.collect { case n if f.isDefinedAt(n) => n }.size

  // ---- Decontaminate --------------------------------------------------

  test("decontaminate flags exactly the docs sharing an n-gram") {
    val train = Seq(
      (1L, "a b c d e f"), // shares the 3-gram "b c d"
      (2L, "x y z w v u"), // disjoint
      (3L, "c d e q r s")  // shares "c d e"
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e zz")).toDF("doc_id", "text")
    val flagged = Decontaminate
      .contaminatedIds(train, eval, "doc_id", "text", 3)
      .as[Long].collect().sorted
    assert(flagged.toSeq == Seq(1L, 3L))
    val kept = Decontaminate.clean(train, eval, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L))
  }

  test("decontaminate: sub-n-gram docs are never flagged") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b c")).toDF("doc_id", "text")
    assert(Decontaminate.contaminatedIds(train, eval, "doc_id", "text", 3)
      .count() == 0)
  }

  test("q116 plan: gram joins broadcast, no sort-merge, no cartesian") {
    val p = executed("q116_decontaminate")
    assert(countNodes(p) { case _: SortMergeJoinExec => () } == 0, p.toString.take(3000))
    assert(countNodes(p) { case _: CartesianProductExec => () } == 0)
    assert(countNodes(p) { case _: BroadcastNestedLoopJoinExec => () } == 0)
    assert(p.toString.contains("BroadcastHashJoin"), p.toString.take(3000))
  }

  // ---- PiiScrub -------------------------------------------------------

  test("pii scrub counts and redacts each family; email wins overlaps") {
    val df = Seq(
      ("reach me at a.b-c_d@mail.example.org or 10.1.2.3", 1L),
      ("call 555-0199 or 555-0200 today", 2L),
      ("no pii here", 3L),
      // the email's host embeds dotted digits: email redaction must
      // consume it before the IP pattern can bite
      ("x 99user@10.2.3.4mail.com y", 4L)
    ).toDF("text", "id")
    val r = df.select(col("id"),
      PiiScrub.emailCount(col("text")).as("e"),
      PiiScrub.phoneCount(col("text")).as("p"),
      PiiScrub.ipv4Count(col("text")).as("i"),
      PiiScrub.redact(col("text")).as("red"))
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 1 && r(0).getLong(3) == 1)
    assert(r(0).getString(4) == "reach me at <EMAIL> or <IP>")
    assert(r(1).getLong(2) == 2 &&
      r(1).getString(4) == "call <PHONE> or <PHONE> today")
    assert(r(2).getLong(1) == 0 && r(2).getLong(2) == 0 && r(2).getLong(3) == 0)
    assert(r(3).getString(4) == "x <EMAIL> y", r(3).getString(4))
  }

  test("q117 plan: map-only metrics — no joins, one agg exchange + sort") {
    val p = executed("q117_pii_scrub")
    assert(countNodes(p) { case _: SortMergeJoinExec => () } == 0)
    assert(!p.toString.contains("Join"), p.toString.take(2000))
    // partial->final agg on lang plus the output sort: nothing else
    // may shuffle (the per-doc regexp work is inside the scan stage)
    assert(countNodes(p) { case _: ShuffleExchangeExec => () } <= 2,
      p.toString.take(3000))
  }

  // ---- SemanticDedup --------------------------------------------------

  private def assignedFixture: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // cell 0: ids 1,2 identical direction (cos=1), id 3 orthogonal;
    // cell 1: ids 4,5 orthogonal — nothing dropped there
    Seq(
      (1L, Seq(1.0, 0.0), 0L), (2L, Seq(2.0, 0.0), 0L), (3L, Seq(0.0, 1.0), 0L),
      (4L, Seq(1.0, 0.0), 1L), (5L, Seq(0.0, 1.0), 1L)
    ).toDF("vec_id", "v", "cid")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
  }

  test("semantic dedup drops the higher id of every over-threshold pair") {
    val dropped = SemanticDedup.dropIds(assignedFixture, 0.9)
      .as[Long].collect().sorted
    assert(dropped.toSeq == Seq(2L))
    val kept = SemanticDedup.dedup(assignedFixture, 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("semantic dedup never pairs across cells") {
    // ids 10/11 are identical vectors but in DIFFERENT cells: the
    // cluster-scoped contract must not see the pair
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((10L, Seq(1.0, 0.0), 0L), (11L, Seq(1.0, 0.0), 1L))
      .toDF("vec_id", "v", "cid")
      .withColumn("nrm", lit(1.0))
    assert(SemanticDedup.pairs(df, 0.5).count() == 0)
  }

  test("semantic dedup cell cap: an over-cap cell is left un-deduped") {
    assert(SemanticDedup.dropIds(assignedFixture, 0.9, maxCellSize = 2)
      .as[Long].collect().toSeq == Seq.empty)
    // cap admitting the 3-vector cell restores the drop
    assert(SemanticDedup.dropIds(assignedFixture, 0.9, maxCellSize = 3)
      .as[Long].collect().toSeq == Seq(2L))
  }

  test("q118 plan: no cartesian, no nested-loop — the pair join is an equi-join") {
    val p = executed("q118_semantic_dedup")
    assert(countNodes(p) { case _: CartesianProductExec => () } == 0)
    assert(countNodes(p) { case _: BroadcastNestedLoopJoinExec => () } == 0)
  }

  // ---- DomainMix ------------------------------------------------------

  test("domain-mix rates: exact integer basis points, capped at 10000") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), // dom a: weight 200
      ("b", 3L, 40L)                    // dom b: weight 40
    ).toDF("dom", "id", "w")
    val r = DomainMix.rates(df, "dom", col("w"), 2)
      .orderBy("dom").collect()
    // total 240, budget = 240 DIV (2*2) = 60;
    // a: 10000*60 DIV 200 = 3000; b: min(10000, 10000*60 DIV 40) = 10000
    assert(r(0).getAs[Long]("rate_bp") == 3000L, r.mkString(","))
    assert(r(1).getAs[Long]("rate_bp") == 10000L)
  }

  test("domain-mix sample is deterministic and honors a full-keep rate") {
    val df = Seq(("b", 3L, 40L), ("b", 4L, 40L)).toDF("dom", "id", "w")
    // single domain: budget = 80 DIV 2 = 40, rate = 5000bp — but with
    // ONE domain the outcome set must be identical across runs
    val k1 = DomainMix.sample(df, "id", "dom", col("w"), 2, "s")
      .select("id").as[Long].collect().sorted.toSeq
    val k2 = DomainMix.sample(df, "id", "dom", col("w"), 2, "s")
      .select("id").as[Long].collect().sorted.toSeq
    assert(k1 == k2)
  }

  test("q119 plan: rate join broadcasts — the corpus never sort-merges") {
    val p = executed("q119_domain_mix")
    assert(countNodes(p) { case _: SortMergeJoinExec => () } == 0,
      p.toString.take(3000))
    assert(countNodes(p) { case _: CartesianProductExec => () } == 0)
  }

  // ---- RepetitionStats ------------------------------------------------

  test("repetition stats: max 2-gram count and flags") {
    val df = Seq(
      ("a b a b a b", 1L),  // 2-grams: ab,ba,ab,ba,ab -> max 3 of 5
      ("a b c d e f", 2L),  // all distinct -> max 1
      ("x", 3L)             // no 2-grams
    ).toDF("text", "id")
    val toks = split(col("text"), " ")
    val r = df.select(col("id"),
      RepetitionStats.maxGram2Count(toks).as("m2"),
      size(RepetitionStats.grams2(toks)).as("n2"),
      RepetitionStats.dupTokenFlag(toks, 60).as("fd"),
      RepetitionStats.topGram2Flag(toks, 10).as("f2"))
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 3 && r(0).getInt(2) == 5)
    assert(r(0).getBoolean(3)) // 6 tokens, 2 distinct -> 66% dups
    assert(r(0).getBoolean(4)) // 3/5 = 60% >= 10%
    assert(r(1).getLong(1) == 1 && !r(1).getBoolean(3))
    assert(r(2).getLong(1) == 0 && r(2).getInt(2) == 0)
  }

  test("q120 plan: per-row metrics stay map-only — no joins, bounded exchanges") {
    val p = executed("q120_repetition_rules")
    assert(!p.toString.contains("Join"), p.toString.take(2000))
    assert(countNodes(p) { case _: ShuffleExchangeExec => () } <= 2,
      p.toString.take(3000))
  }

  test("q155: exactly k per stratum, reprocessing-stable, partial top-k plan") {
    val got = graft.SparkEntry.queries("q155_quota_sample")(spark, sf0001)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every stratum filled to its quota with positions 1..20
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 20L), s"$lang quota broken")
    }
    // subset invariance: dropping other docs cannot change a pick that
    // ranks within the quota (hash ranks are per-row, not positional)
    val again = graft.SparkEntry.queries("q155_quota_sample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q156: each epoch is a different deterministic permutation") {
    val rows = graft.SparkEntry.queries("q156_epoch_shuffle")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e0 = rows.filter(_._1 == 0).sortBy(_._2).map(_._3).toSeq
    val e1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3).toSeq
    assert(e0.length == 20 && e1.length == 20)
    assert(e0 != e1, "epoch orders must decorrelate")
    assert(e0.distinct.length == 20 && e1.distinct.length == 20)
  }

  // ---- C4Rules --------------------------------------------------------

  test("C4 line rules: terminal punct, min words, javascript, doc markers") {
    import graft.operators.C4Rules
    val df = Seq(
      "good line here ok.\nshort one.\nno terminal punct here\n" +
        "please enable javascript to view this.\nanother good line stays."
    ).toDF("t")
    val kept = df.select(C4Rules.keptLines(col("t"), 4).as("k"))
      .head().getSeq[String](0)
    assert(kept == Seq("good line here ok.", "another good line stays."))
    val bad = Seq("x { y", "lorem ipsum z", "clean text").toDF("t")
      .select(C4Rules.docBad(col("t")).as("b")).collect().map(_.getBoolean(0))
    assert(bad.toSeq == Seq(true, true, false))
  }

  test("q197: the per-doc rewrite is map-only — one exchange, no explode") {
    // AQE's toString prints the initial plan after the final one —
    // keep only the final section before counting
    val p = executed("q197_c4_rules").toString.split("== Initial Plan ==")(0)
    // the ONLY data exchange is the 5-group lang aggregation (plus the
    // presentation orderBy's range partition); the per-doc line
    // rewrite never explodes or re-groups
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Generate"), p.take(3000))
  }

  // ---- bloom decontamination ------------------------------------------

  test("bloom prefilter is invisible: equals the exact contamination set") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val train = docs.where(col("doc_id") % 5 =!= 0)
    val eval = docs.where(col("doc_id") % 5 === 0)
    val exact = Decontaminate
      .contaminatedIds(train, eval, "doc_id", "text", 8)
      .as[Long].collect().sorted.toSeq
    val bloomed = Decontaminate
      .bloomContaminatedIds(train, eval, "doc_id", "text", 8, 65536, 5)
      .as[Long].collect().sorted.toSeq
    assert(bloomed == exact)
  }

  test("bloom prefilter with TINY bits still admits every true positive") {
    // undersized filter => many false positives, but never a false
    // negative: the exact verify must still recover the same set
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val train = docs.where(col("doc_id") % 5 =!= 0)
    val eval = docs.where(col("doc_id") % 5 === 0)
    val exact = Decontaminate
      .contaminatedIds(train, eval, "doc_id", "text", 8)
      .as[Long].collect().sorted.toSeq
    val bloomed = Decontaminate
      .bloomContaminatedIds(train, eval, "doc_id", "text", 8, 256, 2)
      .as[Long].collect().sorted.toSeq
    assert(bloomed == exact)
  }

  // ---- q203: intra-doc paragraph dedup --------------------------------

  test("q203: every planted duplicate paragraph is removed, keep-first") {
    val rows = defOf("q203_intradoc_dedup").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 500)
    rows.foreach { case (id, nParas, nKept) =>
      assert(nKept <= nParas)
      // a planted re-append of an EXISTING paragraph must always drop
      if (id % 3 == 0 || id % 4 == 0) assert(nKept < nParas, s"doc $id")
    }
  }

  test("q203: map-only — no exchange except the presentation sort") {
    val p = executed("q203_intradoc_dedup").toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p.take(3000))
    assert(!p.contains("Generate"), p.take(3000))
  }

  // ---- q204: URL curation ---------------------------------------------

  test("UrlOps: host, registered domain, utm-stripping normalization") {
    import graft.operators.UrlOps
    val rows = Seq(
      "https://WWW.src3.com/p/12?utm_source=u9&id=2#s2",
      "https://cdn.src5.org/p/12?id=2",
      "https://src7.net/p/3").toDF("url")
      .select(UrlOps.host(col("url")).as("h"),
        UrlOps.registeredDomain(UrlOps.host(col("url"))).as("r"),
        UrlOps.normalized(col("url")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) == (("www.src3.com", "src3.com",
      "https://www.src3.com/p/12?id=2")))
    assert(rows(1) == (("cdn.src5.org", "src5.org",
      "https://cdn.src5.org/p/12?id=2")))
    assert(rows(2) == (("src7.net", "src7.net", "https://src7.net/p/3")))
  }

  test("q204: normalization collapses utm variants; blocklist hits whole domains") {
    val rows = defOf("q204_url_curation").run(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // normalization must produce real collisions: fewer distinct
    // normalized URLs than unblocked docs somewhere
    assert(rows.exists { case (_, n, b, u) => u < n - b })
    // a blocked registered domain blocks ALL its docs
    rows.filter(r => CurationQueries.BlockedDomains.contains(r._1))
      .foreach { case (reg, n, b, u) =>
        assert(b == n && u == 0, s"$reg: $n docs, $b blocked, $u urls")
      }
    // unblocked domains never count as blocked
    rows.filterNot(r => CurationQueries.BlockedDomains.contains(r._1))
      .foreach { case (reg, _, b, _) => assert(b == 0, reg) }
  }

  test("q219: leaky URL groups span folds; every fold row is consistent") {
    val rows = defOf("q219_url_leakage").run(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "fixture must exhibit URL-aliased leakage")
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    rows.foreach { case (fold, urls, docs) =>
      assert(urls >= 1 && docs >= urls, s"$fold: $urls urls, $docs docs")
    }
    // a leaky group spans >= 2 folds by definition, so at least two
    // fold rows must appear
    assert(rows.length >= 2)
  }

  test("q289 group split: no source ever spans folds; assignment is md5-stable") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def fold(source: String): String = {
      val bp = java.lang.Long.parseLong(
        md.digest(("g42:" + source).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 7), 16) % 10000L
      if (bp < 8000) "train" else if (bp < 9000) "val" else "test"
    }
    val expect = docs.groupBy(d => fold(d._2)).map { case (f, ds) =>
      (f, ds.length.toLong, ds.map(_._2).distinct.length.toLong,
        ds.map(_._1).sum)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q289_group_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
    // structural no-leak: fold counts of distinct sources partition
    // the global distinct-source set
    val totalSources = docs.map(_._2).distinct.length.toLong
    assert(got.map(_._3).sum == totalSources)
  }

  test("q291 kappa == independent confusion-matrix replay on sf0.001") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(t: String): Long = java.lang.Long.parseLong(
      md.digest(("w:" + t).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7), 16) % 10000L - 5000L
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("text", "n_chars").collect()
      .map(r => (r.getString(0).split(" ", -1).map(weight).sum >= 0,
        r.getLong(1) >= 300L))
    val n = docs.length.toLong
    val n11 = docs.count(d => d._1 && d._2).toLong
    val n10 = docs.count(d => d._1 && !d._2).toLong
    val n01 = docs.count(d => !d._1 && d._2).toLong
    val n00 = docs.count(d => !d._1 && !d._2).toLong
    val po = 1000000L * (n11 + n00) / n
    val pe = 1000000L * ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    val kappa = 1000000L * (po - pe) / (1000000L - pe)
    val got = graft.SparkEntry.queries("q291_cohens_kappa")(
      spark, "/root/testdata/sf0.001").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((n, n11, n10, n01, n00)))
    assert((got.getLong(5), got.getLong(6), got.getLong(7)) == ((po, pe, kappa)))
    // the two raters genuinely agree beyond chance on this fixture
    assert(kappa > 0)
  }

  test("q292 clipped n-gram precision == naive replay; bigram edge on 1-token docs") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id % 2 AS par", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    def counts(grams: Seq[(Long, String)]) = {
      val cand = grams.filter(_._1 == 1L).groupBy(_._2).map { case (g, x) => g -> x.size.toLong }
      val ref = grams.filter(_._1 == 0L).groupBy(_._2).map { case (g, x) => g -> x.size.toLong }
      val nCand = cand.values.sum
      val nClip = cand.map { case (g, c) => math.min(c, ref.getOrElse(g, 0L)) }.sum
      (nCand, nClip, 10000L * nClip / nCand)
    }
    val uni = texts.flatMap { case (p, t) => t.map(p -> _) }.toSeq
    val bi = texts.flatMap { case (p, t) =>
      t.sliding(2).filter(_.size == 2).map(w => p -> w.mkString(" "))
    }.toSeq
    val expect = Seq(1L -> counts(uni), 2L -> counts(bi))
      .map { case (o, (a, b, c)) => (o, a, b, c) }
    val got = graft.SparkEntry.queries("q292_ngram_precision")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("q279 Brier calibration == independent Scala replay on sf0.001") {
    // replay shares no code with the gate: Java MessageDigest md5,
    // plain integer arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(t: String): Long = {
      val hex = md.digest(("w:" + t).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7)
      java.lang.Long.parseLong(hex, 16) % 10000L - 5000L
    }
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val per = docs.map { case (text, nChars) =>
      val score = text.split(" ", -1).map(weight).sum
      val pBp = math.max(0L, math.min(159999L, score + 80000L)) / 16L
      val y = if (nChars >= 300) 10000L else 0L
      (pBp / 1000L, y == 10000L, pBp, (pBp - y) * (pBp - y))
    }
    val bins = per.groupBy(_._1).map { case (bin, rs) =>
      val n = rs.length.toLong
      val nPos = rs.count(_._2).toLong
      val sp = rs.map(_._3).sum
      val sq = rs.map(_._4).sum
      (bin, n, nPos, sp / n, 10000L * nPos / n,
        sp / n - 10000L * nPos / n, sq / n)
    }.toSeq
    val n = per.length.toLong
    val nPos = per.count(_._2).toLong
    val sp = per.map(_._3).sum
    val sq = per.map(_._4).sum
    val expect = ((-1L, n, nPos, sp / n, 10000L * nPos / n,
      sp / n - 10000L * nPos / n, sq / n) +: bins).sortBy(_._1)
    val got = graft.SparkEntry.queries("q279_brier_calibration")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect)
  }
}
