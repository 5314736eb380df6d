package graft.sources

import org.apache.spark.sql.types.Decimal
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray,
  ColumnarBatch, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** SELECTION-VECTOR machinery for the catalog's vectorized scan: lets
  * a decoded [[ColumnarBatch]] serve a SUBSET of its rows (position
  * deletes applied, pushed filters evaluated exactly) without copying
  * a single value — the Iceberg `ColumnVectorWithFilter` idea. Spark's
  * `ColumnarBatch` has no native selection vector, so each output
  * column is a thin view that remaps `rowId -> sel(rowId)` into the
  * delegate vector the parquet decoder filled. `ColumnarToRow` and
  * whole-stage codegen consume the view through the stock
  * [[ColumnVector]] getters; the indirection is one array load per
  * access, vs re-decoding the whole file record-at-a-time — which is
  * what the pre-round-17 fallback paid the moment a table carried one
  * DELETE.
  */
private[sources] object ColumnarSelect {

  /** Mutable indirection target: the reader rebuilds `sel` per batch
    * while the wrapper vectors (allocated once per reader) keep
    * pointing here. */
  final class SelHolder {
    var sel: Array[Int] = _
  }

  /** A row-remapped view of `delegate`: logical row `i` reads the
    * delegate's physical row `sel(i)`. Children (struct fields,
    * interval legs) share the SAME selection — Spark's final
    * `getStruct` builds `ColumnarRow(this, rowId)` and probes children
    * at the parent's logical rowId, so each child must remap too.
    * Array/map reads delegate whole (`getArray(sel(i))` returns the
    * delegate's own view over unmapped element data — element offsets
    * are physical and stay valid). */
  final class MappedColumnVector(delegate: ColumnVector, h: SelHolder)
      extends ColumnVector(delegate.dataType) {

    // the delegate's reader owns the memory; the view frees nothing
    override def close(): Unit = ()

    // conservative (counts over the WHOLE physical batch): consumers
    // use these only to skip null checks when false/zero, so an
    // overcount is always safe
    override def hasNull: Boolean = delegate.hasNull
    override def numNulls: Int = delegate.numNulls

    override def isNullAt(i: Int): Boolean = delegate.isNullAt(h.sel(i))
    override def getBoolean(i: Int): Boolean = delegate.getBoolean(h.sel(i))
    override def getByte(i: Int): Byte = delegate.getByte(h.sel(i))
    override def getShort(i: Int): Short = delegate.getShort(h.sel(i))
    override def getInt(i: Int): Int = delegate.getInt(h.sel(i))
    override def getLong(i: Int): Long = delegate.getLong(h.sel(i))
    override def getFloat(i: Int): Float = delegate.getFloat(h.sel(i))
    override def getDouble(i: Int): Double = delegate.getDouble(h.sel(i))
    override def getArray(i: Int): ColumnarArray =
      delegate.getArray(h.sel(i))
    override def getMap(i: Int): ColumnarMap = delegate.getMap(h.sel(i))
    override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
      delegate.getDecimal(h.sel(i), precision, scale)
    override def getUTF8String(i: Int): UTF8String =
      delegate.getUTF8String(h.sel(i))
    override def getBinary(i: Int): Array[Byte] =
      delegate.getBinary(h.sel(i))

    private lazy val kids =
      new java.util.concurrent.ConcurrentHashMap[Integer, MappedColumnVector]()
    override def getChild(ordinal: Int): ColumnVector =
      kids.computeIfAbsent(ordinal,
        o => new MappedColumnVector(delegate.getChild(o), h))
  }

  /** One reusable mapped output batch over a (stable) delegate batch:
    * `refresh(sel, n)` re-points the selection and row count — zero
    * per-batch allocation after the first. */
  final class MappedBatch(delegates: Array[ColumnVector]) {
    private val holder = new SelHolder
    private val batch = new ColumnarBatch(
      delegates.map(d => new MappedColumnVector(d, holder): ColumnVector))
    def refresh(sel: Array[Int], n: Int): ColumnarBatch = {
      holder.sel = sel
      batch.setNumRows(n)
      batch
    }
  }

  /** COMPUTED long column — how the batch path serves the `__pos`
    * row-id metadata column (live position in the snapshot ordering,
    * never stored in parquet). The reader fills `values` per batch,
    * already selection-resolved: index = OUTPUT row ordinal. */
  final class LongValuesVector
      extends ColumnVector(org.apache.spark.sql.types.LongType) {
    private[sources] var values: Array[Long] = new Array[Long](0)
    private[sources] def ensure(n: Int): Array[Long] = {
      if (values.length < n) values = new Array[Long](n)
      values
    }
    override def close(): Unit = ()
    override def hasNull: Boolean = false
    override def numNulls: Int = 0
    override def isNullAt(i: Int): Boolean = false
    override def getLong(i: Int): Long = values(i)
    private def unsupported(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"$what on the computed __pos LONG vector")
    override def getBoolean(i: Int): Boolean = unsupported("getBoolean")
    override def getByte(i: Int): Byte = unsupported("getByte")
    override def getShort(i: Int): Short = unsupported("getShort")
    override def getInt(i: Int): Int = unsupported("getInt")
    override def getFloat(i: Int): Float = unsupported("getFloat")
    override def getDouble(i: Int): Double = unsupported("getDouble")
    override def getArray(i: Int): ColumnarArray = unsupported("getArray")
    override def getMap(i: Int): ColumnarMap = unsupported("getMap")
    override def getDecimal(i: Int, p: Int, s: Int): Decimal =
      unsupported("getDecimal")
    override def getUTF8String(i: Int): UTF8String =
      unsupported("getUTF8String")
    override def getBinary(i: Int): Array[Byte] = unsupported("getBinary")
    override def getChild(ordinal: Int): ColumnVector =
      unsupported("getChild")
  }
}
