package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min Sketch aggregation as a native Catalyst typed aggregate
  * (Cormode & Muthukrishnan, J. Algorithms 2005): DEPTH×WIDTH counters;
  * each input item increments one counter per depth row; the frequency
  * estimate for an item is the MIN of its counters — always ≥ the true
  * count, with overcount bounded by (2/WIDTH)·N per row whp.
  *
  * This is the canonical 100 TB sketch shape: the aggregation state is a
  * FIXED 3×1024 long array regardless of input cardinality — a billion
  * rows stream through map-side partials that merge by elementwise add
  * (commutative/associative, so any partial-aggregation tree gives the
  * identical sketch), where an exact groupBy would shuffle the full key
  * set. Second TypedImperativeAggregate in the engine after
  * [[SimhashAgg]]; same ObjectHashAggregate execution path.
  *
  * Bucket hashing is ORACLE-RECOMPUTABLE by design: the input is the
  * engine's 60-bit md5 hash ([[graft.functions.Text.hash60SparkSql]]) and
  * depth d's bucket is bit-slice `(h >>> 10·d) & 1023` — three disjoint
  * 10-bit slices of the md5, which DuckDB reproduces with the same
  * shift/mask on the same hash, so a plain SQL GROUP BY rebuilds the
  * exact counter array and the correctness gate hash-verifies the whole
  * sketch path (`ta_heavy_hitters`).
  */
case class CmsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CmsAgg.{Depth, Width}

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < Depth) {
        buf(d * Width + (((h >>> (10 * d)) & (Width - 1)).toInt)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Depth * Width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_agg"

  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

object CmsAgg {

  /** 3 rows × 1024 buckets: ~24 KB of state; overcount ≤ ~0.2% of the
    * stream per estimate whp at any input size. Width MUST stay a power
    * of two (the bucket slice is a mask) and 10·Depth ≤ 60 (slices must
    * fit the md5-derived hash). */
  val Depth = 3
  val Width = 1024

  /** Column-level entry point: Count-Min sketch (flat DEPTH×WIDTH long
    * array) of a LongType hash column under `agg(...)`. */
  def cms(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(CmsAgg(ColumnBridge.toExpr(c)).toAggregateExpression())
  }
}
