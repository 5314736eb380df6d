package graft

import java.nio.file.{Files, Paths}

/** Isolated per-query timing harness — the adjudication tool for
  * driver-bench variance (this VM's co-tenant stall windows inflate
  * full-suite totals 3-7x for hours; see PLANS.md round-6). Unlike
  * [[Bench]] (one cold pass over every query, driver-comparable),
  * this runs each named query SERIALIZED with a warm pass first, then
  * takes the median of 3 timed runs — so artifact builds, FrameMemo
  * checkpoints, and codegen land in `warm_sec` and the medians are
  * per-query marginal cost, the only number trustworthy under a noisy
  * VM.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.Timings
  * [q1,q2,...|all] [outFile.json]` — prints one JSON object and
  * optionally writes it to `outFile`.
  */
object Timings {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val names =
      if (args.isEmpty || args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(',').toSeq
    val outFile = args.drop(1).headOption
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val spark = GraftSession.build("graft-timings", cpus.toInt)
    spark.range(100000).selectExpr("sum(id)").collect()

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val rows = names.map { name =>
      val warm = once(name)
      val runs = Seq.fill(3)(once(name))
      val median = runs.sorted.apply(1)
      System.err.println(f"[timings] $name warm=$warm%.2f runs=" +
        runs.map(r => f"$r%.2f").mkString(",") + f" median=$median%.2f")
      (name, warm, runs, median)
    }

    val qjson = rows.map { case (name, warm, runs, median) =>
      s""""$name":{"warm_sec":$warm,"runs_sec":[${runs.mkString(",")}],""" +
        s""""median_sec":$median}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"mode":"isolated_median_of_3_warm","sf":"$sfDir","cpus":$cpus,""" +
        s""""queries":$qjson}"""
    println(json)
    outFile.foreach(f => Files.writeString(Paths.get(f), json + "\n"))
    spark.stop()
  }
}
