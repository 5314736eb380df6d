package graft.sources

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField,
  StructType}

/** Field-id COLUMN MAPPING for catalog tables — what makes
  * `ALTER TABLE RENAME/DROP COLUMN` metadata-only operations, exactly
  * the Delta column-mapping / Iceberg field-id model:
  *
  *  - every column carries a STABLE field id (`parquet.field.id`, the
  *    key Spark's parquet codec writes into file footers and matches
  *    on when field-id reading is enabled), assigned at CREATE and
  *    never reused;
  *  - the PHYSICAL schema is append-only forever: a dropped column
  *    stays in it (flagged), so historical rows and commit files keep
  *    decoding positionally, and a rename touches only the name slot;
  *  - the LOGICAL schema (what the table surfaces) is the physical
  *    schema minus dropped fields — reads project, writes expand, and
  *    NO data file is ever rewritten for a schema change;
  *  - old data files written under an old name still serve a renamed
  *    column because parquet matches them BY ID, not by name.
  *
  * Tables created before mapping existed carry no ids; rename/drop on
  * them refuses loudly (the Delta protocol-upgrade posture).
  */
private[sources] object ColumnMapping {

  /** The key Spark's ParquetWriteSupport/ReadSupport use. */
  val IdKey = "parquet.field.id"
  /** Marks a logically-dropped physical column. */
  val DroppedKey = "graft.dropped"

  def fieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey)) else None

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  /** True iff every physical field carries an id — the capability
    * gate for rename/drop. */
  def mapped(phys: StructType): Boolean = phys.fields.forall(f =>
    fieldId(f).isDefined)

  /** Assign ids 1..n to a CREATE-time schema (idempotent on fields
    * that already carry one). */
  def withIds(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      if (fieldId(f).isDefined) f
      else f.copy(metadata = new MetadataBuilder()
        .withMetadata(f.metadata).putLong(IdKey, i + 1L).build())
    })

  def nextId(phys: StructType): Long =
    phys.fields.flatMap(fieldId).foldLeft(0L)(math.max) + 1L

  /** The user-visible schema: physical minus dropped columns. */
  def logical(phys: StructType): StructType =
    StructType(phys.fields.filterNot(isDropped))

  /** Physical index of each LOGICAL slot. */
  def logicalToPhys(phys: StructType): Array[Int] =
    phys.fields.iterator.zipWithIndex.collect {
      case (f, i) if !isDropped(f) => i
    }.toArray

  def rename(f: StructField, newName: String): StructField =
    f.copy(name = newName)

  def markDropped(f: StructField): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putBoolean(DroppedKey, true).build())

  /** Expand a LOGICAL-arity row to the physical layout (dropped slots
    * NULL). Identity when nothing was ever dropped. */
  def expand(r: org.apache.spark.sql.catalyst.InternalRow,
      phys: StructType, l2p: Array[Int])
      : org.apache.spark.sql.catalyst.InternalRow =
    if (l2p.length == phys.length) r
    else {
      val vals = new Array[Any](phys.length)
      var j = 0
      while (j < l2p.length) {
        val p = l2p(j)
        vals(p) = if (r.isNullAt(j)) null else r.get(j, phys(p).dataType)
        j += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
    }

  /** Append-only compatibility between two PHYSICAL schemas: shared
    * slots keep their datatype and field id (names and dropped flags
    * may change — that is the whole point); new slots only append. */
  def compatible(oldPhys: StructType, newPhys: StructType): Boolean =
    newPhys.length >= oldPhys.length &&
      oldPhys.fields.zip(newPhys.fields).forall { case (a, b) =>
        a.dataType == b.dataType && fieldId(a) == fieldId(b)
      }
}
