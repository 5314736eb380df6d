package graft.tools
import org.apache.spark.sql.SparkSession
/** Manual end-to-end drive of the library surface (not a unit test):
  * flagship entry + SQL misuse probes. Run:
  *   sbt "Test/runMain graft.tools.Drive" */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(graft.sources.Tables.requiredConf).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.entry(spark)
    println("ENTRY ROWS=" + e.count() + " RESULT=" + e.collect().mkString(","))
    def probe(tag: String, sql: String): Unit =
      try println(s"$tag OK: " + spark.sql(sql).collect().mkString(","))
      catch { case ex: Throwable =>
        println(s"$tag ERR: " + ex.getMessage.linesIterator.next()) }
    probe("PROBE1 argcount", "SELECT appx_median_bounded(l_quantity) FROM lineitem")
    probe("PROBE2 nonconst", "SELECT appx_median_bounded(l_quantity, l_linenumber) FROM lineitem")
    probe("PROBE3 intcol", "SELECT CAST(appx_median_bounded(l_linenumber, 100000) AS DOUBLE) AS m FROM lineitem")
    probe("PROBE4 kzero", "SELECT appx_median_bounded(l_quantity, 0) FROM lineitem")
    spark.stop()
  }
}
