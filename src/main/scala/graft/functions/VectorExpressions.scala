package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `double_dot(a, b)` — dot product of two array<double> columns as a
  * native codegen'd loop over `ArrayData`.
  *
  * The `aggregate(zip_with(...))` formulation allocates a zipped array and
  * evaluates two lambda closures per row; at millions of candidate pairs ×
  * 64+ dims that allocation dominates. The generated code here is a plain
  * `for` loop — same left-to-right summation order, so values are
  * bit-identical to the HOF form (and to DuckDB's list accumulation).
  * Length mismatch truncates to the shorter array (fixed-dim inputs in
  * practice).
  */
case class DoubleDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  def doubleDot(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection size of two PRE-SORTED string arrays (merge scan). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection size of two PRE-SORTED int arrays (merge scan). */
  def sortedIntersectCountInt(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection size of two PRE-SORTED long arrays (merge scan). */
  def sortedIntersectCountLong(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Pack a 1-based dictionary-id int array into a fixed-width bitset. */
  def toBitset(toks: Column, nWords: Int): Column =
    ColumnBridge.column(ToBitset(ColumnBridge.expression(toks), nWords))

  /** popcount(a AND b) over two equal-width long-array bitsets. */
  def bitsetAndCount(a: Column, b: Column): Column =
    ColumnBridge.column(BitsetAndCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 1-based id of the SMALLEST common element of two bitsets (0 if
    * disjoint) — the canonical-witness primitive for dedup-free
    * candidate emission.
    */
  def bitsetFirstCommon(a: Column, b: Column): Column =
    ColumnBridge.column(BitsetFirstCommon(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `to_bitset(toks, nWords)` — pack a set of 1-based dictionary ids into an
  * `array<long>` bitset of fixed word width (id i → word (i−1)/64, bit
  * (i−1)%64). Small-dictionary corpora (the degenerate case for prefix
  * filtering: every "rare" gram is still common) get set intersection as
  * popcount-of-AND over a few cache lines instead of a merge scan over
  * hundreds of ints — see [[BitsetAndCount]].
  */
case class ToBitset(child: Expression, nWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "to_bitset"

  override def nullSafeEval(a: Any): Any =
    ToBitset.build(a.asInstanceOf[ArrayData], nWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ToBitset.build($c, $nWords)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ToBitset {
  def build(toks: ArrayData, nWords: Int): ArrayData = {
    val words = new Array[Long](nWords)
    val n = toks.numElements()
    val max = nWords.toLong * 64
    var i = 0
    while (i < n) {
      val id = toks.getInt(i)
      // registered on the public SQL surface — fail with the contract, not
      // a raw ArrayIndexOutOfBounds from generated code
      if (id < 1 || id > max) throw new IllegalArgumentException(
        s"to_bitset ids must be in [1, nWords*64] = [1, $max]; got $id")
      val t = id - 1
      words(t >> 6) |= (1L << (t & 63))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(words)
  }
}

/** `bitset_and_count(a, b)` — |A ∩ B| as popcount of the word-wise AND of
  * two [[ToBitset]]-packed sets: O(dictionary/64) with no branches, vs the
  * O(|A|+|B|) branchy merge scan — ~10× on 200-element sets over a small
  * dictionary, which is what candidate verification does millions of times.
  */
case class BitsetAndCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_and_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    BitsetAndCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetAndCount.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitsetAndCount {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    c
  }
}

/** `bitset_first_common(a, b)` — the 1-based dictionary id of the
  * SMALLEST element of A ∩ B over two [[ToBitset]] bitsets, 0 when
  * disjoint: first non-zero word of the AND, then numberOfTrailingZeros.
  * This is the canonical-witness primitive behind dedup-free candidate
  * emission: a prefix equi-join emits a (pair, shared-token) match per
  * shared token, and keeping only the match whose token IS the pair's
  * smallest shared prefix token yields each pair exactly once — no
  * dropDuplicates shuffle on the candidate stream.
  */
case class BitsetFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_first_common"

  override def nullSafeEval(a: Any, b: Any): Any =
    BitsetFirstCommon.first(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetFirstCommon.first($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitsetFirstCommon {
  def first(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val w = a.getLong(i) & b.getLong(i)
      if (w != 0L) return i * 64 + java.lang.Long.numberOfTrailingZeros(w) + 1
      i += 1
    }
    0
  }
}

/** `sorted_intersect_count(a, b)` — |A ∩ B| for two sorted string arrays
  * via a single merge scan: O(n+m) comparisons, no per-row hash set
  * allocation (Spark's `array_intersect` builds one per call — at millions
  * of candidate pairs that allocation dominates exact-dedup verification).
  * Inputs MUST be sorted ascending and duplicate-free (array_sort ∘
  * array_distinct); both interpreted eval and generated code share the
  * kernel below.
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  /** Merge-scan intersection count over sorted UTF8String arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** [[SortedIntersectCount]] over sorted int arrays — the hot verify path
  * after dictionary-encoding shingles: int compares beat 5-char UTF8String
  * compares ~5×, and the arrays shuffle at 4 bytes/element instead of
  * string bytes + offsets.
  */
case class SortedIntersectCountInt(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count_int"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountInt.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountInt.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCountInt {
  /** Merge-scan intersection count over sorted int arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** [[SortedIntersectCountInt]] over sorted LONG arrays — the verify kernel
  * for batch-stable (hash-encoded) shingle sets, whose element ids are
  * 64-bit digests rather than dictionary ranks.
  */
case class SortedIntersectCountLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountLong.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountLong.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCountLong {
  /** Merge-scan intersection count over sorted long arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
