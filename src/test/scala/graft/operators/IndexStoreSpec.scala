package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class IndexStoreSpec extends SparkTestBase {

  private def withIsolatedRoot[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft_index_spec").toString
    val prev = sys.props.get("graft.index.store")
    sys.props("graft.index.store") = dir
    try body(dir)
    finally prev match {
      case Some(p) => sys.props("graft.index.store") = p
      case None => sys.props.remove("graft.index.store")
    }
  }

  test("readOrBuild builds once, then serves the persisted artifact") {
    withIsolatedRoot { _ =>
      val src = Files.createTempFile("graft_src", ".parquet")
      var builds = 0
      def build = { builds += 1; spark.range(5).select(col("id")) }
      val path = IndexStore.artifactPath("/data/sf1", "ivf")
      val first = IndexStore.readOrBuild(spark, path, src.toString)(build)
      assert(first.count() == 5 && builds == 1)
      val second = IndexStore.readOrBuild(spark, path, src.toString)(build)
      assert(second.count() == 5 && builds == 1,
        "fresh artifact must be read, not rebuilt")
      assert(Files.exists(Paths.get(path, "_SUCCESS")))
    }
  }

  test("a stale artifact (source newer) is rebuilt, not served") {
    withIsolatedRoot { _ =>
      val src = Files.createTempFile("graft_src", ".parquet")
      var builds = 0
      def build = { builds += 1; spark.range(3).select(col("id")) }
      val path = IndexStore.artifactPath("/data/sf1", "ivf")
      IndexStore.readOrBuild(spark, path, src.toString)(build)
      assert(builds == 1)
      // source rewritten AFTER the artifact: must trigger a rebuild
      val newer = Files.getLastModifiedTime(Paths.get(path, "_SUCCESS"))
        .toMillis + 5000
      Files.setLastModifiedTime(src,
        java.nio.file.attribute.FileTime.fromMillis(newer))
      IndexStore.readOrBuild(spark, path, src.toString)(build)
      assert(builds == 2, "stale artifact must be rebuilt")
    }
  }

  test("rebuild always writes and returns a frame over the artifact") {
    withIsolatedRoot { _ =>
      val path = IndexStore.artifactPath("/data/sf2", "cents")
      val df = IndexStore.rebuild(spark, path)(
        spark.range(4).select(col("id").as("cid")))
      assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
      val df2 = IndexStore.rebuild(spark, path)(
        spark.range(2).select(col("id").as("cid")))
      assert(df2.count() == 2, "rebuild must overwrite")
    }
  }

  test("artifact paths are per-fixture and filesystem-safe") {
    val a = IndexStore.artifactPath("/root/testdata/sf0.01", "ivf")
    val b = IndexStore.artifactPath("/root/testdata/sf0.1", "ivf")
    assert(a != b)
    assert(!a.stripPrefix(IndexStore.root).contains("/root"),
      s"sfDir must be slug-escaped inside the store: $a")
  }

  test("paths embed the code format version") {
    val a = IndexStore.artifactPath("/data/sf1", "ivf")
    assert(a.contains(s"/v${IndexStore.FormatVersion}/"),
      s"artifacts from older build code must be unreachable: $a")
  }

  test("a derived artifact goes stale when its upstream is rebuilt") {
    withIsolatedRoot { _ =>
      val src = Files.createTempFile("graft_src", ".parquet")
      val upPath = IndexStore.artifactPath("/data/sf1", "cents")
      val downPath = IndexStore.artifactPath("/data/sf1", "index")
      var downBuilds = 0
      IndexStore.rebuild(spark, upPath)(spark.range(2).select(col("id")))
      def down = { downBuilds += 1; spark.range(6).select(col("id")) }
      IndexStore.readOrBuild(spark, downPath, src.toString,
        IndexStore.successMarker(upPath))(down)
      IndexStore.readOrBuild(spark, downPath, src.toString,
        IndexStore.successMarker(upPath))(down)
      assert(downBuilds == 1, "fresh chain must not rebuild")
      // upstream rebuilt AFTER the derived artifact: derived is stale
      val newer = Files.getLastModifiedTime(Paths.get(downPath, "_SUCCESS"))
        .toMillis + 5000
      IndexStore.rebuild(spark, upPath)(spark.range(3).select(col("id")))
      Files.setLastModifiedTime(Paths.get(upPath, "_SUCCESS"),
        java.nio.file.attribute.FileTime.fromMillis(newer))
      IndexStore.readOrBuild(spark, downPath, src.toString,
        IndexStore.successMarker(upPath))(down)
      assert(downBuilds == 2, "derived artifact must rebuild after upstream")
    }
  }

  test("rebuild leaves no in-progress temp directory behind") {
    withIsolatedRoot { _ =>
      val path = IndexStore.artifactPath("/data/sf3", "pq")
      IndexStore.rebuild(spark, path)(spark.range(2).select(col("id")))
      assert(!Files.exists(Paths.get(s"$path.inprogress")))
      assert(Files.exists(Paths.get(path, "_SUCCESS")))
    }
  }
}
