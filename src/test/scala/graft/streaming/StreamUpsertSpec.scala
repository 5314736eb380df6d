package graft.streaming

import graft.SparkTestBase
import graft.operators.Upsert

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** CDC changelog merge under streaming ingest: each micro-batch of
  * change rows folds into the snapshot via `foreachBatch` +
  * [[Upsert.merge]] — the standard continuous-MERGE pattern (the
  * sink-side half of CDC; the batch semantics are UpsertSpec/q135).
  * The folded snapshot must equal the one-shot batch merge of the
  * full changelog REGARDLESS of how the changes split into batches,
  * because merge is associative when versions are monotone per key:
  * merge(merge(S, C1), C2) = merge(S, C1 ∪ C2). */
class StreamUpsertSpec extends SparkTestBase {

  import spark.implicits._

  private def base = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")
  ).toDF("k", "v")

  // interleaved updates/deletes/inserts, versions monotone per key
  private val changelog = Seq(
    (2L, 1L, "U", "b1"), (3L, 1L, "D", null), (6L, 1L, "U", "f"),
    (2L, 2L, "U", "b2"), (6L, 2L, "D", null), (4L, 1L, "U", "d1"),
    (3L, 2L, "U", "c-back"), (7L, 1L, "U", "g"))

  private def snap(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("foreachBatch merge over two micro-batches equals the one-shot batch merge") {
    implicit val sqlCtx = spark.sqlContext

    // the running snapshot a real job would keep in a table; a plain
    // var + localCheckpoint is the in-memory stand-in
    var snapshot = base
    val mem = MemoryStream[(Long, Long, String, String)]
    val q = mem.toDF().toDF("k", "ver", "op", "v")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        snapshot = Upsert.merge(snapshot, batch, "k", "ver", "op")
          .localCheckpoint()
      }
      .outputMode("append").start()
    mem.addData(changelog.take(4): _*)
    q.processAllAvailable()
    mem.addData(changelog.drop(4): _*)
    q.processAllAvailable()
    q.stop()

    val oneShot = Upsert.merge(base, changelog.toDF("k", "ver", "op", "v"),
      "k", "ver", "op")
    assert(snap(snapshot) == snap(oneShot),
      "incremental fold must equal the one-shot merge")
    // and the fold did what CDC promises
    val m = snap(snapshot)
    assert(m(2L) == "b2", "second-batch update must supersede the first")
    assert(m(3L) == "c-back", "upsert after delete must revive the key")
    assert(!m.contains(6L), "insert then delete must leave no key")
    assert(m(7L) == "g")
    assert(m(1L) == "a" && m(5L) == "e")
  }

  test("batch-boundary placement cannot change the folded snapshot") {
    for (split <- Seq(2, 5, 7)) {
      val folded = changelog.grouped(split).foldLeft(base) { (s, chunk) =>
        Upsert.merge(s, chunk.toDF("k", "ver", "op", "v"), "k", "ver", "op")
          .localCheckpoint()
      }
      val oneShot = Upsert.merge(base, changelog.toDF("k", "ver", "op", "v"),
        "k", "ver", "op")
      assert(snap(folded) == snap(oneShot), s"split=$split diverged")
    }
  }
}
