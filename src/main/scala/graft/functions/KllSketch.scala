package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (the KLL/MRL compactor family — Karnin,
  * Lang & Liberty, "Optimal quantile approximation in streams") as a
  * native Catalyst `TypedImperativeAggregate` — percentiles at 100 TB
  * without a global sort.
  *
  * The buffer is a stack of levels; an item at level i carries weight 2^i.
  * Values enter at level 0; a full level sorts itself and promotes one
  * element of each adjacent pair to the level above (the survivor parity
  * alternates deterministically via a compaction counter — no RNG, so a
  * given input order reproduces bit-identically). Total weight is
  * preserved EXACTLY by construction (each pair promotes one
  * double-weight survivor; an odd leftover stays put), so `n` — and any
  * COUNT-style use — is exact under every partitioning; only the rank
  * positions are approximate, with error O(log(n/k)/k) of n (the uniform-
  * capacity compactor bound; k=256 holds observed rank error well under
  * 1% at n=10⁶).
  *
  * Merge concatenates per-level buffers and re-compacts bottom-up — state
  * stays O(k·log(n/k)) doubles per partial regardless of input size, so
  * map-side combine, AQE retries, and streaming complete-mode aggregation
  * all work unchanged ([[SpaceSavingTopK]] / [[CountMinEstimate]]'s
  * pattern; this completes the sketch family: heavy hitters, frequencies,
  * quantiles).
  *
  * Three aggregates over the same buffer give the production "sketch
  * table" shape — hash once at ingest, merge forever after:
  *  - [[Kll.kllQuantiles]]: values → quantile estimates directly;
  *  - [[Kll.kllBuild]]: values → serialized sketch (a binary column you
  *    PERSIST, e.g. one row per source per day);
  *  - [[Kll.kllMergeQuantiles]]: serialized sketches → quantile estimates
  *    (answer "p99 over any day range / source set" by merging a handful
  *    of kilobyte rows — the 100 TB history is never rescanned).
  */
final class KllBuffer(val k: Int) extends Serializable {
  require(k >= 8, s"k must be >= 8, got $k")

  var n: Long = 0L
  var compactions: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(new ArrayBuffer[Double])

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).length >= k) compact(0)
  }

  private def compact(i: Int): Unit = {
    if (levels.length <= i + 1) levels += new ArrayBuffer[Double]
    val sorted = levels(i).sorted
    val m = sorted.length
    val parity = (compactions & 1L).toInt
    compactions += 1
    levels(i).clear()
    if (m % 2 == 1) levels(i) += sorted(m - 1) // odd leftover keeps its level+weight
    val up = levels(i + 1)
    var p = 0
    while (2 * p + 1 < m) { up += sorted(2 * p + parity); p += 1 }
    if (up.length >= k) compact(i + 1)
  }

  def merge(o: KllBuffer): Unit = {
    n += o.n
    compactions += o.compactions
    var i = 0
    while (i < o.levels.length) {
      if (levels.length <= i) levels += new ArrayBuffer[Double]
      levels(i) ++= o.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.length) { // re-establish capacity bottom-up
      if (levels(i).length >= k) compact(i)
      i += 1
    }
  }

  /** Estimated value at quantile q ∈ [0,1]: the smallest retained value
    * whose cumulative weight reaches rank ⌈q·n⌉ (q=0 → min, q=1 → max).
    * Exact order statistics while n < k (nothing has compacted yet).
    */
  def quantile(q: Double): Double = {
    val items = levels.zipWithIndex
      .flatMap { case (buf, i) => buf.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var idx = 0
    while (idx < items.length) {
      cum += items(idx)._2
      if (cum >= target) return items(idx)._1
      idx += 1
    }
    items.last._1
  }

  def serialize: Array[Byte] = {
    val size = 4 + 8 + 8 + 4 + levels.map(4 + _.length * 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(k); bb.putLong(n); bb.putLong(compactions); bb.putInt(levels.length)
    levels.foreach { buf => bb.putInt(buf.length); buf.foreach(bb.putDouble) }
    bb.array()
  }
}

object KllBuffer {
  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new KllBuffer(bb.getInt())
    b.n = bb.getLong(); b.compactions = bb.getLong()
    val nLevels = bb.getInt()
    b.levels.clear()
    var i = 0
    while (i < nLevels) {
      val len = bb.getInt()
      val buf = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { buf += bb.getDouble(); j += 1 }
      b.levels += buf
      i += 1
    }
    b
  }
}

/** Shared TypedImperativeAggregate plumbing over a [[KllBuffer]]. */
sealed trait KllAggregate extends TypedImperativeAggregate[KllBuffer] {
  def k: Int
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = { a.merge(b); a }
  override def serialize(buf: KllBuffer): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): KllBuffer = KllBuffer.deserialize(bytes)
  override def nullable: Boolean = false

  protected def quantileRows(buf: KllBuffer, qs: Seq[Double]): Any =
    if (buf.n == 0L) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      qs.map(q => InternalRow(q, buf.quantile(q)): Any).toArray)

  protected def quantileType: DataType = ArrayType(StructType(Seq(
    StructField("q", DoubleType),
    StructField("value", DoubleType))))
}

/** values → array<struct<q, value>> directly. */
case class KllQuantiles(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KllAggregate {
  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def eval(buf: KllBuffer): Any = quantileRows(buf, qs)
  override def dataType: DataType = quantileType
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_quantiles"
  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** values → serialized sketch (binary) — the persistable artifact. */
case class KllBuild(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KllAggregate {

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def eval(buf: KllBuffer): Any = buf.serialize
  override def dataType: DataType = BinaryType
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_build"
  override def withNewMutableAggBufferOffset(o: Int): KllBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** serialized sketches (binary column) → ONE serialized sketch — the
  * rollup-maintenance aggregate: fold yesterday's stored sketch rows and
  * today's batch sketches into a new storable row without touching raw
  * history. Same k check as [[KllMergeQuantiles]].
  */
case class KllMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KllAggregate {

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val other = KllBuffer.deserialize(v.asInstanceOf[Array[Byte]])
      require(other.k == k,
        s"stored sketch k=${other.k} != aggregate k=$k — rebuild or re-parameterize")
      buf.merge(other)
    }
    buf
  }
  override def eval(buf: KllBuffer): Any = buf.serialize
  override def dataType: DataType = BinaryType
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_merge"
  override def withNewMutableAggBufferOffset(o: Int): KllMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** serialized sketches (binary column) → array<struct<q, value>>. A
  * stored sketch's k must equal this aggregate's k (checked: mismatched
  * compaction capacities would silently skew error bounds).
  */
case class KllMergeQuantiles(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KllAggregate {
  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val other = KllBuffer.deserialize(v.asInstanceOf[Array[Byte]])
      require(other.k == k,
        s"stored sketch k=${other.k} != aggregate k=$k — rebuild or re-parameterize")
      buf.merge(other)
    }
    buf
  }
  override def eval(buf: KllBuffer): Any = quantileRows(buf, qs)
  override def dataType: DataType = quantileType
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_merge_quantiles"
  override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** SCALAR quantile extraction from one serialized sketch per row (the
  * aggregates above fold many rows; this reads a stored sketch column in
  * a plain projection). CodegenFallback is fine here: it runs once per
  * ROLLUP row (thousands), never per data row.
  */
case class KllSketchQuantiles(child: Expression, qs: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")

  override protected def nullSafeEval(input: Any): Any = {
    val buf = KllBuffer.deserialize(input.asInstanceOf[Array[Byte]])
    if (buf.n == 0L) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(qs.map(q => InternalRow(q, buf.quantile(q)): Any).toArray)
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", DoubleType),
    StructField("value", DoubleType))))
  override def prettyName: String = "kll_sketch_quantiles"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Kll {
  // The value aggregates' update() trusts a Double child, so the Column
  // API coerces at ANALYSIS time (`AbstractDataType` is private[sql], so
  // the aggregates can't declare inputTypes themselves). Without this, a
  // Decimal column — whose runtime class is not java.lang.Double — would
  // pass analysis and crash executors mid-job.
  private def asDouble(c: Column): Column = c.cast("double")

  /** Column API: quantile estimates straight from a numeric column. */
  def kllQuantiles(c: Column, qs: Seq[Double], k: Int = 256): Column =
    ColumnBridge.column(
      KllQuantiles(ColumnBridge.expression(asDouble(c)), k, qs).toAggregateExpression())

  /** Column API: serialized sketch of a numeric column (persist me). */
  def kllBuild(c: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KllBuild(ColumnBridge.expression(asDouble(c)), k).toAggregateExpression())

  /** Column API: quantile estimates from a column of serialized sketches. */
  def kllMergeQuantiles(c: Column, qs: Seq[Double], k: Int = 256): Column =
    ColumnBridge.column(
      KllMergeQuantiles(ColumnBridge.expression(c), k, qs).toAggregateExpression())

  /** Column API: fold serialized sketches into one storable sketch. */
  def kllMerge(c: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KllMerge(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: scalar per-row quantile read of a stored sketch. */
  def kllSketchQuantiles(c: Column, qs: Seq[Double]): Column =
    ColumnBridge.column(KllSketchQuantiles(ColumnBridge.expression(c), qs))
}
