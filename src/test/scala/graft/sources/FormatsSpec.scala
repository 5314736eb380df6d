package graft.sources

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class FormatsSpec extends SparkTestBase {

  private def nationDf = Tables.load(spark, sf0001, "nation")

  test("CSV round-trip preserves rows and schema (explicit schema, no infer pass)") {
    val src = nationDf
    Formats.writeCsv(src, "/tmp/fmt_nation_csv")
    val back = Formats.readCsv(spark, "/tmp/fmt_nation_csv", src.schema)
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON-lines round-trip preserves rows") {
    val src = nationDf
    Formats.writeJsonLines(src, "/tmp/fmt_nation_json")
    val back = Formats.readJsonLines(spark, "/tmp/fmt_nation_json", src.schema)
    assert(back.count() == src.count())
    assert(back.where(col("n_name") === "CHINA").count() ==
      src.where(col("n_name") === "CHINA").count())
  }

  test("ORC round-trip preserves rows and schema; scan pushes filters and prunes columns") {
    val src = nationDf
    Formats.writeOrc(src, "/tmp/fmt_nation_orc")
    val back = Formats.readOrc(spark, "/tmp/fmt_nation_orc")
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    val qe = back.where(col("n_regionkey") === 2).select("n_name")
      .queryExecution.executedPlan.toString
    assert(qe.contains("EqualTo(n_regionkey,2)"), qe) // stripe-index pushdown
    assert(qe.contains("ReadSchema: struct<n_name:string,n_regionkey:int>"), qe)
  }

  test("Avro round-trip preserves rows, schema, and the timestamp logical type") {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    Formats.writeAvro(ev, "/tmp/fmt_events_avro")
    val back = Formats.readAvro(spark, "/tmp/fmt_events_avro")
    // self-describing container: schema (incl. TIMESTAMP via the
    // timestamp-micros logical type) rides in the file header
    assert(back.schema == ev.schema, s"${back.schema} vs ${ev.schema}")
    assert(back.orderBy("event_id").collect().toSeq ==
      ev.orderBy("event_id").collect().toSeq)
    // row format: column pruning still narrows the READ SCHEMA Spark
    // requests (deserializer skips fields), even without stat pushdown
    val plan = back.select("event_type").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<event_type:string>"), plan)
  }

  test("CSV scan pushes filters down to the source") {
    val src = nationDf
    Formats.writeCsv(src, "/tmp/fmt_nation_csv")
    val plan = Formats.readCsv(spark, "/tmp/fmt_nation_csv", src.schema)
      .where(col("n_regionkey") === 2)
      .select("n_name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]")
      || plan.contains("EqualTo(n_regionkey,2)"), plan)
  }
}
