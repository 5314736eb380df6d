package graft.queries

import graft.functions.GraftFunctions
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Queries exercising the reference UDA surface — `appx_median_bounded`
  * and the generalized `reservoir_sample` (SURVEY §2.1, §7.1-3/4).
  *
  * All oracle-checked variants run in the exact regime (`max_samples >=
  * group size`, SURVEY §2.1 invariant 4) so results are deterministic:
  * the reservoir never evicts and the answer is exactly the value-sorted
  * element at 0-based index n/2 (upper middle, no interpolation —
  * `median.cc:299-301`). The DuckDB oracle selects that same element
  * explicitly via `row_number`, since DuckDB's `median` interpolates and
  * `quantile_disc` takes the LOWER middle (SURVEY §7.3-3).
  *
  * Scale note: the aggregate's state is O(k) per group and merges
  * partial states size-proportionally, so the same plan (partial agg →
  * exchange → final agg) holds at 100 TB; only the exact-regime k must
  * then be replaced by a bounded k with tolerance semantics.
  */
object MedianQueries {

  // k chosen >= any group size at every test SF (lineitem sf0.1 = 600k).
  private val ExactK = 2 * 1000 * 1000

  private def upperMedianSql(table: String, col: String, out: String,
      partitionBy: Seq[String]): String = {
    val pb = if (partitionBy.isEmpty) "" else s"PARTITION BY ${partitionBy.mkString(", ")}"
    val keep = if (partitionBy.isEmpty) "" else partitionBy.mkString("", ", ", ",")
    val orderBy = if (partitionBy.isEmpty) "" else s" ORDER BY ${partitionBy.mkString(", ")}"
    s"""SELECT $keep $col AS $out FROM (
       |  SELECT $keep $col,
       |         row_number() OVER ($pb ORDER BY $col) AS rn,
       |         count(*) OVER ($pb) AS n
       |  FROM $table WHERE $col IS NOT NULL
       |) t WHERE rn = n // 2 + 1$orderBy""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // The reference README walkthrough (`README.md:61`) on real data:
    // CAST(appx_median_bounded(x, k) AS DOUBLE), exact regime.
    QueryDef("q13_median_exact",
      upperMedianSql("lineitem", "l_quantity", "med", Seq.empty)) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "lineitem")
        .agg(GraftFunctions.appx_median_bounded(col("l_quantity"), ExactK)
          .cast("double").as("med"))
    },

    // Grouped medians: one reservoir per group key.
    QueryDef("q14_median_by_flag",
      upperMedianSql("lineitem", "l_quantity", "med", Seq("l_returnflag"))) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(GraftFunctions.appx_median_bounded_double(col("l_quantity"), ExactK).as("med"))
        .orderBy(col("l_returnflag"))
    },

    // A second column + group key shape (events.value by event_type),
    // driven through the SQL registration path (2-arg SQL parity).
    QueryDef("q15_median_events",
      upperMedianSql("events", "value", "med", Seq("event_type"))) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "events").createOrReplaceTempView("events")
      spark.sql(s"""
        SELECT event_type,
               CAST(appx_median_bounded(value, $ExactK) AS DOUBLE) AS med
        FROM events GROUP BY event_type ORDER BY event_type""")
    },

    // Generalized reservoir: exact regime returns every non-null value,
    // value-sorted, as ARRAY<DOUBLE>.
    QueryDef("q16_reservoir_exact",
      s"""SELECT l_returnflag, list(l_quantity ORDER BY l_quantity) AS sample_vals
         |FROM lineitem WHERE l_quantity IS NOT NULL
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      GraftFunctions.register(spark)
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(GraftFunctions.reservoir_sample(col("l_quantity"), ExactK).as("sample_vals"))
        .orderBy(col("l_returnflag"))
    }
  )
}
