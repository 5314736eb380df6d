package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class VecDotSpec extends SparkTestBase {

  private def register(): Unit = GraftFunctions.register(spark)

  test("vec_dot equals the HOF fold bit-for-bit (same summation order)") {
    import spark.implicits._
    register()
    val rnd = new scala.util.Random(3)
    val rows = (1 to 100).map(_ =>
      (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val both = df.select(
      GraftFunctions.vec_dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("null array yields null; null elements contribute zero") {
    import spark.implicits._
    register()
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0), Some(1.0)))),
      (Some(Seq(Some(2.0), None)), Some(Seq(Some(5.0), Some(7.0)))))
      .toDF("a", "b")
    val out = df.select(GraftFunctions.vec_dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 10.0)
  }

  test("type mismatch fails analysis with a named constraint") {
    import spark.implicits._
    register()
    Seq((Seq(1, 2), Seq(1.0, 2.0))).toDF("a", "b").createOrReplaceTempView("vt")
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(a, a) FROM vt").collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>"), e.getMessage)
  }

  test("SQL registration path works") {
    import spark.implicits._
    register()
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) AS d FROM vecs")
      .collect()(0).getDouble(0) == 32.0)
  }
}
