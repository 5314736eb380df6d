package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (where
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  * Column names and row order must match between the two — the
  * driver's compare sorts columns by name and hashes values. */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  /** A gate where ONE ANSI SQL string is the whole query: Spark runs
    * it via `spark.sql` over the named fixture tables (registered as
    * temp views) and the oracle runs the IDENTICAL text in DuckDB —
    * the strongest statement of SQL-surface parity. Only valid for
    * queries written in the common ANSI dialect of both engines. */
  def sqlSurface(name: String, sql: String, tables: Seq[String]): QueryDef =
    QueryDef(name, (spark, dir) => {
      tables.foreach(t => graft.sources.Tables.load(spark, dir, t)
        .createOrReplaceTempView(t))
      spark.sql(sql)
    }, Some(sql))
}
