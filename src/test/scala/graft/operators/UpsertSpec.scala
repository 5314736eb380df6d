package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Changelog-merge semantics and plan shape: update/insert/delete in
  * one pass, latest version wins, version ties resolve
  * deterministically, untouched rows pass through, and the merge
  * never windows/sorts the snapshot. Oracle-gated result parity at
  * fixture scale is q135. */
class UpsertSpec extends SparkTestBase {

  import spark.implicits._

  private def base = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")
  ).toDF("k", "v")

  private def merged(changes: (Long, Long, String, String)*): Map[Long, String] =
    Upsert.merge(base, changes.toSeq.toDF("k", "ver", "op", "v"),
        "k", "ver", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("update, insert, delete, and pass-through in one merge") {
    val m = merged(
      (2L, 1L, "U", "b2"),   // update
      (5L, 1L, "U", "e"),    // insert (key not in base)
      (3L, 1L, "D", null))   // delete
    assert(m == Map(1L -> "a", 2L -> "b2", 4L -> "d", 5L -> "e"))
  }

  test("latest version wins, including a late tombstone") {
    val m = merged(
      (2L, 1L, "U", "first"), (2L, 3L, "U", "third"), (2L, 2L, "U", "second"),
      (4L, 1L, "U", "revived"), (4L, 2L, "D", null))
    assert(m(2L) == "third")
    assert(!m.contains(4L), "higher-version delete must win over the update")
  }

  test("an earlier tombstone loses to a later upsert") {
    val m = merged((3L, 1L, "D", null), (3L, 2L, "U", "back"))
    assert(m(3L) == "back")
  }

  test("exact version ties resolve deterministically (struct order: U beats D)") {
    val a = merged((1L, 7L, "D", null), (1L, 7L, "U", "tie"))
    val b = merged((1L, 7L, "U", "tie"), (1L, 7L, "D", null))
    assert(a == b, "merge must not depend on changelog row order")
    assert(a(1L) == "tie")
  }

  test("the merge plan aggregates + joins — no Window, no global Sort") {
    val changes = Seq((2L, 1L, "U", "x")).toDF("k", "ver", "op", "v")
    val plan = Upsert.merge(base, changes, "k", "ver", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin") || !plan.contains("Window"),
      plan)
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"), plan)
  }

  test("a base frame with no payload columns is rejected") {
    val keysOnly = Seq(1L, 2L).toDF("k")
    val changes = Seq((1L, 1L, "U")).toDF("k", "ver", "op")
    intercept[IllegalArgumentException] {
      Upsert.merge(keysOnly, changes, "k", "ver", "op")
    }
  }
}
