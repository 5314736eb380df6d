package graft.plans

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Join elimination must drop exactly the provably-redundant joins —
  * result-invisibly — and decline everything else. */
class JoinElimSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def declareAll(): Unit = {
    JoinElimRule.clear()
    JoinElimRule.declarePk(s"$sf/customer.parquet", "c_custkey")
    JoinElimRule.declareFk(s"$sf/orders.parquet", "o_custkey",
      s"$sf/customer.parquet", "c_custkey")
  }

  private def leftAgg = orders
    .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ksum"))
    .orderBy(col("o_orderpriority"))

  private def innerAgg = orders
    .join(customer, orders("o_custkey") === customer("c_custkey"))
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ksum"))
    .orderBy(col("o_orderpriority"))

  test("left-outer join to a declared PK is dropped, result-invisibly") {
    declareAll()
    val plain = leftAgg.collect().map(_.toSeq).toSeq
    JoinElimRule.scoped(spark) {
      val df = leftAgg
      assert(joins(df) == 0, "left-outer dim join should be eliminated")
      assert(df.collect().map(_.toSeq).toSeq == plain)
    }
  }

  test("inner join with a declared RELY FK is dropped, result-invisibly") {
    declareAll()
    val plain = innerAgg.collect().map(_.toSeq).toSeq
    JoinElimRule.scoped(spark) {
      val df = innerAgg
      assert(joins(df) == 0, "inner FK join should be eliminated")
      assert(df.collect().map(_.toSeq).toSeq == plain)
    }
  }

  test("left-outer survives a dim-side filter (matches stay <= 1)") {
    declareAll()
    JoinElimRule.scoped(spark) {
      val dim = customer.filter(col("c_acctbal") > 0)
      val df = orders.join(dim, orders("o_custkey") === dim("c_custkey"), "left")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joins(df) == 0, "filtered-dim left join is still a no-op")
    }
  }

  test("declines: dim column consumed, missing FK, dim filter on inner, disabled") {
    declareAll()
    JoinElimRule.scoped(spark) {
      // a dimension column is consumed above the join
      val dimCol = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(joins(dimCol) == 1, "dim-column consumer must keep the join")

      // filter above the join referencing a dim column
      val dimFilter = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
        .filter(col("c_nationkey") >= 0)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joins(dimFilter) == 1,
        "filter-on-dim-column consumer must keep the join")

      // inner join with a dim-side filter could drop fact rows
      val dim = customer.filter(col("c_acctbal") > 0)
      val innerFiltered = orders
        .join(dim, orders("o_custkey") === dim("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joins(innerFiltered) == 1,
        "inner join over a filtered dim must be kept")
    }

    // inner join with only a PK declared (no RELY FK): row count is
    // not provably preserved
    JoinElimRule.clear()
    JoinElimRule.declarePk(s"$sf/customer.parquet", "c_custkey")
    JoinElimRule.scoped(spark) {
      assert(joins(innerAgg) == 1, "PK alone must not eliminate an inner join")
      // ... but the left outer still goes
      assert(joins(leftAgg) == 0)
    }

    // rule disabled: nothing fires even with declarations present
    declareAll()
    assert(joins(leftAgg) == 1, "disabled rule must leave the plan alone")
  }

  test("chained dim joins unwind across fixpoint iterations") {
    // orders ⟕ customer ⟕ nation: the customer join is pinned by the
    // nation join's condition (c_nationkey) until the nation join
    // goes; the fixed-point batch then unwinds both.
    declareAll()
    JoinElimRule.declarePk(s"$sf/nation.parquet", "n_nationkey")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val df = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .join(nation, customer("c_nationkey") === nation("n_nationkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    JoinElimRule.scoped(spark) {
      assert(joins(df) == 0, "both chained dim joins should unwind")
    }
  }
}
