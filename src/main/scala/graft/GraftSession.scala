package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured session for this library.
  *
  * Scale-relevant settings, chosen once instead of per-call-site:
  *  - `spark.sql.shuffle.partitions` sized to the executor core count
  *    (the local harness's stand-in for "size shuffles to the cluster,
  *    not the 200 default");
  *  - AQE left ON (Spark 4 default) so skewed shuffles re-plan at
  *    runtime and small partitions coalesce;
  *  - UTC session timezone (oracle comparability);
  *  - the events-table nanos conf from [[graft.sources.Tables]]
  *    applied at construction, keeping `Tables.load` pure.
  */
object GraftSession {

  def build(appName: String, cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.sources.Tables.requiredConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
