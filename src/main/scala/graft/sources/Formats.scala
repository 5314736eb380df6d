package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet source/sink surface (SURVEY §2.2 "Scans / sources /
  * sinks"): CSV and JSON-lines with EXPLICIT schemas.
  *
  * Scale rule encoded here: never `inferSchema` — on a 100 TB input
  * that option triggers a full extra pass before the real scan. The
  * caller always supplies the `StructType` (or reuses one captured
  * from a parquet sibling via `df.schema`). CSV/JSON scans still get
  * partition-parallel reads and (for CSV) filter/column pushdown from
  * the DataSource V2 framework.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round trip — the columnar sibling a mixed-lake deployment
    * reads alongside parquet. Spark's native ORC source keeps the
    * parquet scan properties that matter at scale: predicate pushdown
    * into the stripe/row-group index, column pruning, and
    * partition-parallel splits (asserted in FormatsSpec). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path) // self-describing format: schema rides along

  /** Avro round trip — the row-oriented lake interchange format
    * (Kafka archives, Sqoop-era ingest). Spark's built-in Avro source
    * (bundled with spark-sql since Spark 4) gives splittable
    * container files with block-level compression; as a ROW format it
    * has no column pruning or stat pushdown — the scan reads whole
    * records, which is exactly why a 100 TB lake lands Avro ingest
    * into parquet before analytics. Schema rides in the container
    * header (self-describing, like ORC). */
  // The short name "avro" resolves only when the external spark-avro
  // module jar is deployed (its DataSourceRegister service entry);
  // the FORMAT IMPLEMENTATION itself ships inside spark-sql 4.x, so
  // addressing the class directly uses the identical reader/writer.
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(AvroFormat).save(path)

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroFormat).load(path)

  /** XML round trip (spark-xml moved into spark-sql in Spark 4) —
    * the interchange surface feeds/partners still ship. Explicit
    * schema on read (the no-infer rule: XML inference is an extra
    * full pass) and an explicit rowTag on both sides. A document
    * format: no pushdown, no pruning — like Avro, a 100 TB lake
    * lands it into parquet at ingest. */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).xml(path)
}
