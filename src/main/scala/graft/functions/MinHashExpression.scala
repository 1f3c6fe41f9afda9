package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_sig(elems)` — all `numHashes` MinHash values of an element-id
  * array in ONE codegen'd traversal.
  *
  * The HOF formulation (`array_min(transform(elems, x => (a*x+b) % P))`
  * once per permutation) walks the array `numHashes` times and allocates
  * a permuted copy each walk — and higher-order functions evaluate as
  * interpreted fallbacks inside an otherwise codegen'd stage. Here the
  * generated code is two nested loops over the row's elements and the
  * coefficient table: zero allocation beyond the output signature, one
  * traversal, whole-stage-codegen friendly.
  *
  * Arithmetic contract (must NEVER drift — [[graft.operators.Dedup]]'s
  * persisted near-dup index stores band keys derived from these values,
  * and a probe built from different arithmetic would silently miss every
  * historical bucket): each element is first mapped to `pmod(x, p)` —
  * the identity for dictionary ids already in [0, p) — then permuted as
  * `(a_j * x' + b_j) % p`. With `a < 2^30` and `x' < p < 2^30·2`, the
  * product stays below 2^61: no overflow, same values as the SQL
  * `pmod`/`%` pipeline this replaces, bit-identical DuckDB twins.
  *
  * Null handling mirrors the HOF form element-for-element: `transform`
  * maps a NULL element to NULL and `array_min` skips NULLs, so the
  * kernel skips NULL slots; an empty array — or one that is ALL nulls —
  * yields NULL output (`array_min`'s null-on-empty), keeping downstream
  * `concat_ws` band keys byte-identical. Int and long element arrays
  * are both accepted without an inserted cast projection.
  *
  * Coefficients are `Seq` fields (not `Array`) so the case class keeps
  * structural equality — Catalyst subexpression elimination and plan
  * reuse can match two identically-built signature expressions.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "coefficient arrays must align")

  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray

  // lazy: child types resolve after construction; cached so the
  // interpreted path doesn't re-match per row
  private lazy val elemIsLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType    => true
      case IntegerType => false
      case other => throw new IllegalArgumentException(
        s"minhash_sig expects array<int> or array<long> input, got array<$other>")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = aArr.length
    val out = new Array[Long](m)
    java.util.Arrays.fill(out, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val raw = if (elemIsLong) arr.getLong(i) else arr.getInt(i).toLong
        val x = ((raw % p) + p) % p
        var j = 0
        while (j < m) {
          val h = (aArr(j) * x + bArr(j)) % p
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", aArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bArr, "long[]")
    val getter = if (elemIsLong) "getLong" else "getInt"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val seen = ctx.freshName("seen")
      s"""
        int $n = $a.numElements();
        long[] $out = new long[${aArr.length}];
        java.util.Arrays.fill($out, Long.MAX_VALUE);
        boolean $seen = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            $seen = true;
            long $x = (long) $a.$getter($i);
            $x = (($x % ${p}L) + ${p}L) % ${p}L;
            for (int $j = 0; $j < ${aArr.length}; $j++) {
              long $h = ($asRef[$j] * $x + $bsRef[$j]) % ${p}L;
              if ($h < $out[$j]) $out[$j] = $h;
            }
          }
        }
        if (!$seen) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpression {
  /** The permutation modulus — prime, > any dictionary id or pmod-mapped
    * digest, small enough that `a·x + b` stays under 2⁶¹.
    */
  val P = 1000000007L

  /** Deterministic MinHash permutation coefficients — THE generator for
    * the whole engine (the persisted near-dup index's band keys depend
    * on this exact stream; see [[MinHashSig]]'s contract note).
    */
  def perms(n: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((1L + rnd.nextInt(1000000000), rnd.nextInt(1000000000).toLong))
  }

  /** All minhash values for one permutation family as an array<long>
    * column; see [[MinHashSig]] for the arithmetic contract.
    */
  def minhashSig(elems: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(elems), as.toSeq, bs.toSeq, p))

  /** [[minhashSig]] with the engine's standard coefficient family. */
  def minhashSigDefault(elems: Column, numHashes: Int = 32, seed: Long = 42L): Column = {
    val ps = perms(numHashes, seed)
    minhashSig(elems, ps.map(_._1).toArray, ps.map(_._2).toArray, P)
  }

  /** Expression-level builder for the SQL registration. */
  def sigExpr(elems: Expression, numHashes: Int, seed: Long): Expression = {
    val ps = perms(numHashes, seed)
    MinHashSig(elems, ps.map(_._1), ps.map(_._2), P)
  }
}
