package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** The vectorized file codec in isolation: batches must reproduce the
  * row codec's values exactly (same files, same requested schemas),
  * including pruned reads, missing-column NULL vectors, nested
  * (array) columns, and row-group byte ranges. */
class ParquetBatchIOSpec extends SparkTestBase {

  private def onePart(dir: String): String = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
  }

  private def drain(path: String, req: StructType,
      range: Option[(Long, Long)] = None): Vector[Vector[Any]] = {
    val r = range match {
      case Some((s, e)) => ParquetBatchIO.open(path, req, s, e, Nil)
      case None => ParquetBatchIO.open(path, req)
    }
    try {
      val out = Vector.newBuilder[Vector[Any]]
      var b = r.nextBatch()
      while (b != null) {
        val it = b.rowIterator()
        while (it.hasNext) {
          val row = it.next()
          out += req.fields.indices.map { i =>
            if (row.isNullAt(i)) null else row.get(i, req(i).dataType) match {
              case u: org.apache.spark.unsafe.types.UTF8String => u.toString
              case a: org.apache.spark.sql.catalyst.util.ArrayData =>
                a.toFloatArray().toVector
              case v => v
            }
          }.toVector
        }
        b = r.nextBatch()
      }
      out.result()
    } finally r.close()
  }

  test("batch read matches row read: primitives, strings, pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bio").toString
    spark.range(10000).selectExpr("id", "cast(id * 2.5 as double) AS d",
        "md5(cast(id as string)) AS s", "cast(id % 7 = 0 as boolean) AS b")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val p = onePart(dir)
    val full = StructType(Seq(StructField("id", LongType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("b", BooleanType)))
    val got = drain(p, full)
    assert(got.length == 10000)
    assert(got(17) == Vector(17L, 42.5d,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("17"), false))
    // pruned + reordered request
    val pruned = StructType(Seq(StructField("s", StringType),
      StructField("id", LongType)))
    val g2 = drain(p, pruned)
    assert(g2(17) == Vector(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("17"), 17L))
  }

  test("missing requested column reads as all-NULL vector") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bio2").toString
    spark.range(100).selectExpr("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val req = StructType(Seq(StructField("id", LongType),
      StructField("added_later", StringType)))
    val got = drain(onePart(dir), req)
    assert(got.length == 100)
    assert(got.forall(_(1) == null))
    assert(got.map(_(0)) == (0L until 100L).toVector)
  }

  test("array<float> (embedding) column decodes through nested vectors") {
    val req = StructType(Seq(StructField("emb", ArrayType(FloatType))))
    assert(ParquetBatchIO.supportsBatch(req))
    val dir = java.nio.file.Files.createTempDirectory("graft_bio3").toString
    spark.range(50).selectExpr(
        "transform(sequence(0, 3), x -> cast(id + x as float)) AS emb")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val got = drain(onePart(dir), req)
    assert(got.length == 50)
    assert(got(7)(0) == Vector(7f, 8f, 9f, 10f))
  }

  test("row-group byte range reads exactly that group's rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bio4").toString
    // small row groups so one file carries several
    spark.range(200000).selectExpr("id", "md5(cast(id as string)) AS s")
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "65536").parquet(dir)
    val p = onePart(dir)
    val blocks = ParquetRowIO.blocks(p)
    assert(blocks.length > 1, s"expected several row groups: $blocks")
    val req = StructType(Seq(StructField("id", LongType)))
    var total = 0L
    blocks.foreach { b =>
      val got = drain(p, req, Some((b.startByte, b.endByte)))
      assert(got.length.toLong == b.rows)
      total += got.length
    }
    assert(total == 200000L)
  }
}
