package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications") as a native
  * Catalyst `TypedImperativeAggregate` — bounded-memory frequency
  * estimation for a WATCHLIST of items.
  *
  * The buffer is a depth×width counter matrix (longs); an item increments
  * one counter per row (independent seeded MurmurHash3 — pure arithmetic,
  * identical on every JVM), and its estimate is the minimum across rows.
  * Guarantees `est >= true` always, and `est <= true + εN` with
  * probability ≥ 1−δ for ε = e/width, δ = e^−depth. The merge is
  * element-wise addition — exact, commutative, associative — so map-side
  * partial aggregation ships O(depth·width) state per partition
  * regardless of input size, and the SAME aggregate runs as a streaming
  * complete-mode aggregate ([[SpaceSavingTopK]]'s pattern).
  *
  * Complement to [[SpaceSavingTopK]]: Space-Saving answers "WHICH items
  * are frequent" (it tracks identities), Count-Min answers "how frequent
  * are THESE items" in O(1) memory per query item — e.g. estimating
  * candidate hot keys for a salting decision without a full groupBy.
  *
  * Output: array<struct<item string, est_count long>> in `items` order.
  */
/** Shared counter-matrix plumbing for every CM aggregate — one buffer
  * layout, one update/merge/serialization, so sketches built by any of
  * them stay comparable (the [[KllAggregate]] pattern).
  */
sealed trait CmMatrixAggregate extends TypedImperativeAggregate[Array[Long]] {
  def child: Expression
  def depth: Int
  def width: Int

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      var r = 0
      while (r < depth) { buf(CountMin.slot(item, r, width)) += 1; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bytes.putLong)
    bytes.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
}

case class CountMinEstimate(
    child: Expression,
    items: Seq[String],
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CmMatrixAggregate {

  require(depth > 0 && width > 0, "need depth > 0 and width > 0")
  require(items.nonEmpty, "need a non-empty watchlist")

  override def eval(buf: Array[Long]): Any = {
    val rows = items.map { item =>
      var est = Long.MaxValue
      var r = 0
      while (r < depth) { est = math.min(est, buf(CountMin.slot(item, r, width))); r += 1 }
      InternalRow(UTF8String.fromString(item), est)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est_count", LongType))))

  override def prettyName: String = "count_min_estimate"

  override def withNewMutableAggBufferOffset(o: Int): CountMinEstimate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinEstimate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object CountMinEstimate {
  /** Column API: `countMinEstimate(col, watchlist, depth, width)`. */
  def countMinEstimate(c: Column, items: Seq[String],
      depth: Int = 5, width: Int = 1 << 12): Column =
    ColumnBridge.column(
      CountMinEstimate(ColumnBridge.expression(c), items, depth, width)
        .toAggregateExpression())
}

/** Count-Min sketch as a PERSISTABLE artifact: same counter matrix and
  * seeded hashes as [[CountMinEstimate]], but eval'd to bytes — a binary
  * column you store one row per table/day/source. Its headline consumer
  * is [[CountMin.innerProductEst]]: for two key multisets A and B, the
  * true equi-join output size is the inner product Σ_k a_k·b_k, and the
  * row-wise minimum of the sketch matrices' inner products estimates it
  * with the classic guarantee est ≥ true, est ≤ true + ε·|A|·|B| (ε =
  * e/width, w.p. ≥ 1−e^−depth). That is the pre-flight "how big is this
  * shuffle, is this join skewed enough to Salt" answer, computed from
  * kilobytes instead of running the join.
  */
case class CountMinBuild(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CmMatrixAggregate {

  require(depth > 0 && width > 0, "need depth > 0 and width > 0")

  override def eval(buf: Array[Long]): Any = CountMin.toBytes(depth, width, buf)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "count_min_build"
  override def withNewMutableAggBufferOffset(o: Int): CountMinBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** Scalar inner-product estimate over two stored CM sketches (per-row on
  * sketch tables — CodegenFallback is fine at that cardinality).
  */
case class CmInnerProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CountMin.innerProductEst(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override def dataType: DataType = LongType
  override def prettyName: String = "cm_inner_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CountMin {
  /** The ONE seeded-hash slot rule every CM aggregate shares — sketches
    * are only comparable because this is identical across builders.
    */
  private[functions] def slot(item: String, row: Int, width: Int): Int =
    row * width + ((MurmurHash3.stringHash(item, 1000003 * row + 7) & 0x7fffffff) % width)

  private[functions] def toBytes(depth: Int, width: Int, buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.length * 8)
    bb.putInt(depth); bb.putInt(width)
    buf.foreach(bb.putLong)
    bb.array()
  }

  private def fromBytes(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt(); val w = bb.getInt()
    (d, w, Array.fill(d * w)(bb.getLong()))
  }

  /** est = min_rows Σ_w a[r][w]·b[r][w] — ≥ the true equi-join size,
    * ≤ true + ε·|A|·|B|. Sketches must share (depth, width) (same seeds
    * are implied by construction).
    */
  def innerProductEst(a: Array[Byte], b: Array[Byte]): Long = {
    val (da, wa, ma) = fromBytes(a)
    val (db, wb, mb) = fromBytes(b)
    require(da == db && wa == wb,
      s"sketch shape mismatch: ${da}x$wa vs ${db}x$wb — rebuild with one config")
    var best = Long.MaxValue
    var r = 0
    while (r < da) {
      var s = 0L
      var c = 0
      while (c < wa) { s += ma(r * wa + c) * mb(r * wa + c); c += 1 }
      if (s < best) best = s
      r += 1
    }
    best
  }

  /** Column API: `countMinBuild(col)` → storable binary sketch. */
  def countMinBuild(c: Column, depth: Int = 5, width: Int = 1 << 12): Column =
    ColumnBridge.column(
      CountMinBuild(ColumnBridge.expression(c), depth, width).toAggregateExpression())

  /** Column API: join-size estimate from two sketch columns. */
  def cmInnerProduct(a: Column, b: Column): Column =
    ColumnBridge.column(CmInnerProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
