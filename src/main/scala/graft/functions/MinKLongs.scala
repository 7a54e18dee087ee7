package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable aggregation state for [[MinKLongs]]: the ≤k smallest
  * (key, id) pairs as a BINARY MAX-HEAP ordered by (key, id) — the
  * root is the WORST retained pair, so a full buffer rejects a
  * non-entering row with one comparison and replaces the root in
  * O(log k) when a row does enter. Plain primitive arrays: no
  * per-row boxing, no encoder round-trip. */
private[graft] final class MinKHeap(val k: Int) {
  val keys = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def gt(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
    k1 > k2 || (k1 == k2 && i1 > i2)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (gt(keys(i), ids(i), keys(p), ids(p))) {
        val tk = keys(i); keys(i) = keys(p); keys(p) = tk
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  @annotation.nowarn
  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && gt(keys(l), ids(l), keys(m), ids(m))) m = l
      if (r < size && gt(keys(r), ids(r), keys(m), ids(m))) m = r
      if (m == i) return
      val tk = keys(i); keys(i) = keys(m); keys(m) = tk
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  def insert(key: Long, id: Long): Unit =
    if (size < k) {
      keys(size) = key; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (gt(keys(0), ids(0), key, id)) {
      keys(0) = key; ids(0) = id
      siftDown()
    }
}

/** Native per-group top-k: the k smallest (key, id) pairs by
  * lexicographic (key asc, id asc) — `min_k_longs(key, id, k)`. The
  * scale-safe selection form of `row_number() over (partition by g
  * order by key, id) <= k` (for "score desc" callers: pass -score):
  * partial aggregation keeps ≤k pairs per group per map task, so the
  * exchange carries O(groups·k) where the window funnels every
  * candidate row into ≤|groups| reducers.
  *
  * Why not the typed MinKByKey Aggregator (udaf)? Measured this round:
  * the udaf pays a Catalyst↔Scala encoder round-trip per INPUT row and
  * lost 2–3× to the codegen'd window on 50k–500k-row inputs. This
  * TypedImperativeAggregate reads the child expressions directly off
  * the InternalRow into a primitive-array heap — the per-row cost is
  * two long reads and one comparison once the buffer is full.
  *
  * Returns array<struct<k:long, id:long>> sorted by (k, id) asc —
  * the same shape MinKByKey emits, so topKPerGroup-style consumers
  * posexplode it identically. Null inputs are skipped (callers feed
  * non-null scores/ids by construction). */
case class MinKLongs(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKHeap] with BinaryLike[Expression] {

  require(k > 0, s"min_k_longs: k must be positive, got $k")

  override def left: Expression = key
  override def right: Expression = id
  override def prettyName: String = "min_k_longs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MinKHeap = new MinKHeap(k)

  override def update(buf: MinKHeap, input: InternalRow): MinKHeap = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      buf.insert(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKHeap, other: MinKHeap): MinKHeap = {
    var i = 0
    while (i < other.size) { buf.insert(other.keys(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: MinKHeap): Any = {
    val idx = Array.range(0, buf.size).sortBy(i => (buf.keys(i), buf.ids(i)))
    new GenericArrayData(idx.map(i =>
      InternalRow(buf.keys(i), buf.ids(i)): Any))
  }

  override def serialize(buf: MinKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.keys(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new MinKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong(), bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinKLongs =
    copy(key = newLeft, id = newRight)
}

object MinKLongs {
  /** Column-API entry: `MinKLongs(keyCol, idCol, k)` as an aggregate
    * Column (the DotI64-style ColumnBridge wrapper). */
  def apply(key: org.apache.spark.sql.Column,
            id: org.apache.spark.sql.Column,
            k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinKLongs(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(key),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
