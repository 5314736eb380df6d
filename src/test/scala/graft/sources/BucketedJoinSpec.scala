package graft.sources

import graft.SparkTestBase

/** Bucketing co-locates a join: both tables pre-hashed into the same
  * bucket layout on the join key means the sort-merge join reads
  * matching buckets directly — NO shuffle exchange at query time. At
  * 100 TB this converts every repeated fact⋈dim or fact⋈fact join on
  * the bucketed key from a full-data shuffle into a local merge. */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed-by-key tables join without a shuffle exchange") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // idempotence: a fresh session's catalog does not know about a
      // previous JVM's managed-table directories, and saveAsTable
      // refuses to reuse the leftover location
      for (t <- Seq("t_facts_bkt", "t_dims_bkt", "t_facts_plain")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val dir = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (dir.exists()) {
          dir.listFiles().foreach(_.delete()); dir.delete()
        }
      }

      (1 to 10000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "fv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("t_facts_bkt")
      (0L to 99L).map(k => (k, s"d$k")).toDF("k", "dv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("t_dims_bkt")

      val joined = spark.table("t_facts_bkt")
        .join(spark.table("t_dims_bkt"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000)

      // control: the same data unbucketed DOES shuffle
      spark.table("t_facts_bkt").write.mode("overwrite").saveAsTable("t_facts_plain")
      val control = spark.table("t_facts_plain")
        .join(spark.table("t_dims_bkt"), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(control.contains("Exchange hashpartitioning"), control)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
