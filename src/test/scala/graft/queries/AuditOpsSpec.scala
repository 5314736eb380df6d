package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Independent replays of the q270/q271 audit gates over collected
  * fixtures (no shared code with the queries). */
class AuditOpsSpec extends SparkTestBase {

  test("q271 EWMA == naive sequential replay (exact doubles)") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id", "value")
      .where("user_id < 20").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        (r.getTimestamp(1).getNanos / 1000) % 1000, r.getLong(2),
        math.round(r.getDouble(3) * 100).toDouble))
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      u -> (xs.length.toLong, xs.tail.foldLeft(xs.head)((acc, x) =>
        0.3 * x + 0.7 * acc))
    }
    val got = SparkEntry.queries("q271_ewma_smooth")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expect.size)
    got.foreach { case (u, n, e) =>
      val (en, ee) = expect(u)
      assert(n == en, s"user $u count")
      assert(math.abs(e - ee) < 1e-9, s"user $u ewma: got $e want $ee")
    }
    // ordering sanity: result sorted by user
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }

  test("q273 JS divergence == naive replay; bounded by ln 2; zero on identical slices") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ca = collection.mutable.Map.empty[String, Long]
    val cb = collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, t) =>
      val m = if (id % 2 == 0) ca else cb
      t.split(" ", -1).foreach(tok => m(tok) = m.getOrElse(tok, 0L) + 1)
    }
    val na = ca.values.sum.toDouble
    val nb = cb.values.sum.toDouble
    val terms = (ca.keySet ++ cb.keySet).toSeq
    val jsExpect = terms.map { t =>
      val p = ca.getOrElse(t, 0L) / na
      val q = cb.getOrElse(t, 0L) / nb
      val m = 0.5 * (p + q)
      val x = (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
        (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
      math.floor(x * 1e12 + 0.5).toLong
    }.sum
    val r = SparkEntry.queries("q273_js_divergence")(spark, sf0001)
      .collect().head
    assert(r.getAs[Long]("na") == na.toLong && r.getAs[Long]("nb") == nb.toLong)
    assert(r.getAs[Long]("terms_union") == terms.length.toLong)
    val js = r.getAs[Long]("js_pico")
    assert(js == jsExpect, s"js_pico: got $js want $jsExpect")
    // bounds: 0 <= JS <= ln 2 (in piconats)
    assert(js >= 0L && js <= math.ceil(math.log(2) * 1e12).toLong)
  }

  test("q274 OOV audit: vocab top-k is a bounded heap, vocab join broadcasts") {
    val df = SparkEntry.queries("q274_oov_audit")(spark, sf0001)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), "vocab top-64 bounded heap")
    assert(phys.contains("BroadcastHashJoin"), "vocab join broadcast")
    // counts recompute: per source, n_oov + in-vocab = n_tokens
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    rows.foreach { case (_, n, oov, bp) =>
      assert(oov >= 0 && oov <= n)
      assert(bp == 10000 * oov / n)
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val allToks = docs.flatMap { case (src, t) => t.split(" ", -1).map(src -> _) }
    assert(rows.map(_._2).sum == allToks.length.toLong, "total token volume")
  }

  test("q275 trimmed mean == naive sort-and-slice replay") {
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_returnflag AS f",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).map { case (f, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.length
      val cut = n / 20
      val kept = vs.slice(cut, n - cut)
      f -> (kept.length.toLong, kept.sum,
        1000000L * kept.sum / kept.length)
    }
    val got = SparkEntry.queries("q275_trimmed_mean")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length == expect.size)
    got.foreach { case (f, nk, cents, micro) =>
      assert((nk, cents, micro) == expect(f), s"flag $f")
    }
  }

  test("q277 temporal split: embargo separation is structural; counts replay") {
    val rows = SparkEntry.queries("q277_temporal_split")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val bySplit = rows.map(r => r._1 -> r).toMap
    val train = bySplit("a_train")
    val test = bySplit("c_test")
    // the guarantee the operator exists for: >= 1h between the last
    // train event and the first test event
    assert(test._4 - train._5 >= 3600000000L,
      s"embargo gap violated: ${test._4 - train._5}")
    bySplit.get("b_embargo").foreach { e =>
      assert(e._4 > train._5 && e._5 < test._4)
    }
    // replay the volumes
    val ts = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .selectExpr("CAST(ts AS TIMESTAMP) AS ts").collect()
      .map(r => r.getTimestamp(0).getTime * 1000 +
        (r.getTimestamp(0).getNanos / 1000) % 1000)
    val cutoff = ts.min + (ts.max - ts.min) * 8 / 10
    assert(train._2 == ts.count(_ < cutoff).toLong)
    assert(test._2 == ts.count(_ >= cutoff + 3600000000L).toLong)
    assert(rows.map(_._2).sum == ts.length.toLong)
  }

  test("q270 k-anonymity summary row matches a direct recompute") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("lang", "source", "n_chars - (n_chars % 100) AS b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = docs.groupBy(identity).map(_._2.length.toLong).toSeq
    val got = SparkEntry.queries("q270_k_anonymity")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viol = got.find(_._1 == -1L).get
    assert(viol._2 == classes.count(_ < 5).toLong, "violating classes")
    assert(viol._3 == classes.filter(_ < 5).sum, "violating rows")
    val hist = got.filter(_._1 != -1L)
    assert(hist.map(_._2).sum == classes.length.toLong, "total classes")
    assert(hist.map(_._3).sum == docs.length.toLong, "total rows")
    hist.foreach { case (sz, nc, nr) => assert(nr == sz * nc) }
  }
}
