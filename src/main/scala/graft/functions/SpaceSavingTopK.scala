package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * native Catalyst `TypedImperativeAggregate`.
  *
  * Tracks at most `capacity` counters; when full, the minimum counter is
  * evicted and its count becomes the newcomer's error bound. Guarantees
  * `est >= true >= est - err` per item; with capacity above the true
  * cardinality the result is exact (err = 0). Mergeable → map-side partial
  * aggregation works, so the full-corpus pass at 100 TB is one shuffle of
  * O(capacity) state per partition, not a groupBy over every distinct item.
  *
  * Output: array<struct<item string, est_count long, max_err long>>,
  * sorted by (est_count desc, item asc), truncated to `k`.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  override def update(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.toString
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + 1, e))
      case None if buf.size < capacity => buf.update(item, (1L, 0L))
      case None =>
        // evict the minimum counter; its count seeds the newcomer's error
        val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
        buf.remove(minItem)
        buf.update(item, (minC + 1, minC))
    }
    buf
  }

  override def merge(
      a: mutable.LinkedHashMap[String, (Long, Long)],
      b: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    // Proper Space-Saving merge: an item absent from a FULL sketch may
    // have been evicted there with up to that sketch's minimum count of
    // unattributed mass, so one-sided items absorb the other side's min as
    // count AND error. Without this, `est >= true` breaks across partitions
    // (a heavy hitter evicted in one partition gets undercounted). Sketches
    // below capacity evicted nothing → offset 0 → exact regime unchanged.
    val minA = if (a.size >= capacity) a.valuesIterator.map(_._1).min else 0L
    val minB = if (b.size >= capacity) b.valuesIterator.map(_._1).min else 0L
    val onlyA = a.keySet.diff(b.keySet)
    for ((item, (c, e)) <- b) {
      a.get(item) match {
        case Some((c0, e0)) => a.update(item, (c0 + c, e0 + e))
        case None => a.update(item, (c + minA, e + minA))
      }
    }
    if (minB > 0) for (item <- onlyA) {
      val (c, e) = a(item)
      a.update(item, (c + minB, e + minB))
    }
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      a.clear()
      keep.foreach { case (i, ce) => a.update(i, ce) }
    }
    a
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((i, (c, e)) <- buf) { out.writeUTF(i); out.writeLong(c); out.writeLong(e) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), (in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est_count", LongType),
    StructField("max_err", LongType))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "space_saving_topk"

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object SpaceSavingTopK {
  /** Column API: `spaceSavingTopK(col, k)` (capacity defaults to 8k). */
  def spaceSavingTopK(c: Column, k: Int, capacity: Int = 0): Column = {
    val cap = if (capacity > 0) capacity else 8 * k
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(c), k, cap).toAggregateExpression())
  }
}
