package graft.queries

import graft.SparkTestBase

class FrameMemoSpec extends SparkTestBase {

  test("memoized builds once per key and invalidate forces a rebuild") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((1L, "a")).toDF("id", "v") }

    val first = FrameMemo.memoized(spark, "spec#frame")(build)
    val second = FrameMemo.memoized(spark, "spec#frame")(build)
    assert(builds == 1, "second call must hit the memo")
    assert(first eq second, "the same materialized frame is returned")
    assert(second.count() == 1)

    FrameMemo.invalidate(spark)
    FrameMemo.memoized(spark, "spec#frame")(build)
    assert(builds == 2, "invalidate must force a rebuild")
  }

  test("keys are namespaced: different tags build independently") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq(1L).toDF("id") }
    FrameMemo.memoized(spark, "spec#a")(build)
    FrameMemo.memoized(spark, "spec#b")(build)
    assert(builds == 2)
  }
}
