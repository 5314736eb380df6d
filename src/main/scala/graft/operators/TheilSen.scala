package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend — the median of all pairwise slopes (Theil
  * 1950 / Sen 1968) — with a CALLER-BOUNDED per-key series cap.
  *
  * The naive estimator is quadratic in each key's series length: a
  * single power user with 10⁶ events would fan one task out to
  * ~5·10¹¹ slope pairs. The cap applies the reference UDA's core
  * philosophy — caller-bounded state regardless of group size
  * (`median.cc:45-48`) — to the pair join: before pairing, keep at
  * most `k` events per key, chosen by a DETERMINISTIC md5 rank (a
  * reprocessing-stable uniform subsample, the q192 weighted-sample
  * discipline). Below the cap the series is untouched, so small keys
  * get the EXACT estimator; above it, pair count is bounded by
  * k·(k−1)/2 per key and the estimate is the Theil–Sen of a uniform
  * k-subsample (itself a standard randomized Theil–Sen variant).
  *
  * Everything — the cap rank, the slope integer arithmetic, the
  * disc-lower median — replays exactly in ANSI SQL, so gates over
  * this operator hash-compare against the DuckDB oracle even in the
  * capped regime.
  *
  * Scale shape: one user-keyed window pass for the cap (rank + count
  * share a single partition sort), one user-keyed equi-join whose
  * per-key fan-out is ≤ k·(k−1)/2 rows, and a per-key window over
  * that bounded pair frame. No corpus-proportional single partition
  * anywhere.
  */
object TheilSen {

  /** Slope in exact micro-units with the sign split out BEFORE the
    * integer division — both engines then divide non-negative
    * operands, where floor ≡ truncate (the `//` vs `DIV`
    * negative-division trap the DSIR gate documents). */
  private val slopeSql =
    """CASE WHEN c2 >= c1
      |     THEN (1000000L * (c2 - c1)) DIV (t2 - t1)
      |     ELSE -((1000000L * (c1 - c2)) DIV (t2 - t1)) END""".stripMargin

  /** The md5 cap rank's ORDER BY key — exported so oracle SQL can
    * replay it verbatim (`md5('ts:' || user_id || ':' || t || ':' || c)`). */
  def capRankKey: Column =
    md5(concat(lit("ts:"), col("user_id"), lit(":"), col("t"),
      lit(":"), col("c")))

  /** Keeps ≤ `k` rows per user — the rows with the smallest md5 rank —
    * and attaches the pre-cap count as `n_events`. Input columns:
    * (user_id, t, c); ties on the md5 key break by (t, c), so the kept
    * MULTISET is deterministic even under hash collisions. */
  def cappedSeries(e: DataFrame, k: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val w = byUser.orderBy(capRankKey, col("t"), col("c"))
    e.withColumn("rk", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(byUser))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Per-user Theil–Sen trend over the capped series. Output:
    * (user_id, n_events, n_used, n_pairs, trend_micro); users with
    * fewer than two usable rows emit nothing (no pairs exist). */
  def trend(e: DataFrame, k: Int): DataFrame = {
    val capped = cappedSeries(e, k)
    val a = capped.select(col("user_id"), col("n_events"),
      col("t").as("t1"), col("c").as("c1"))
    val b = capped.select(col("user_id"), col("t").as("t2"),
      col("c").as("c2"))
    val p = a.join(b, Seq("user_id")).where(col("t1") < col("t2"))
      .select(col("user_id"), col("n_events"), expr(slopeSql).as("s"))
    val byUser = Window.partitionBy(col("user_id"))
    p.withColumn("rn", row_number().over(byUser.orderBy(col("s"))))
      .withColumn("n", count(lit(1)).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("n")).as("n_pairs"),
        max(when(col("rn") === floor((col("n") + 1) / 2).cast("long"),
          col("s"))).as("trend_micro"))
      .withColumn("n_used", least(lit(k.toLong), col("n_events")))
      .select(col("user_id"), col("n_events"), col("n_used"),
        col("n_pairs"), col("trend_micro"))
  }

  /** The oracle-side replay of [[trend]] — ONE SQL text parameterized
    * by the cap so the q222/q235 gates can never drift from the
    * operator. `e0` must provide (user_id, t, c). */
  def oracleSql(k: Int): String =
    s"""e1 AS (
       |  SELECT user_id, t, c,
       |         count(*) OVER (PARTITION BY user_id) AS n_events,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY md5('ts:' || user_id || ':' || t || ':' || c),
       |                    t, c) AS rk
       |  FROM e0),
       |e AS (SELECT user_id, t, c, n_events FROM e1 WHERE rk <= $k),
       |p AS (
       |  SELECT a.user_id AS user_id, a.n_events AS n_events,
       |         CASE WHEN b.c >= a.c
       |              THEN (1000000 * (b.c - a.c)) // (b.t - a.t)
       |              ELSE -((1000000 * (a.c - b.c)) // (b.t - a.t)) END AS s
       |  FROM e a JOIN e b ON a.user_id = b.user_id AND a.t < b.t),
       |r AS (
       |  SELECT user_id, n_events, s,
       |         row_number() OVER (PARTITION BY user_id ORDER BY s) AS rn,
       |         count(*) OVER (PARTITION BY user_id) AS n
       |  FROM p)
       |SELECT user_id, max(n_events)::BIGINT AS n_events,
       |       least($k, max(n_events))::BIGINT AS n_used,
       |       max(n)::BIGINT AS n_pairs,
       |       max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
       |                THEN s END)::BIGINT AS trend_micro
       |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin
}
