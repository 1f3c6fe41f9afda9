package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{BitsetAndCount, CharShingles, CmInnerProduct, DoubleDot, IndelRatio, KllSketchQuantiles, MinHashExpression, SortedIntersectCount, SortedIntersectCountInt, SortedIntersectCountLong, ToBitset, TokenSortRatio}

/** SQL surface for graft's custom Catalyst expressions: registers
  * `indel_ratio(a, b)`, `token_sort_ratio(a, b)`, `char_shingles(text, k)`,
  * `sorted_intersect_count[_int](a, b)`, `double_dot(a, b)`,
  * `to_bitset(toks, nWords)`, `bitset_and_count(a, b)`,
  * `cm_inner_product(sketch_a, sketch_b)`,
  * `kll_sketch_quantiles(sketch, array(q, ...))` and
  * `minhash_sig(elems, numHashes)` (engine-default seed — the persisted
  * band keys are pinned to that coefficient stream) so `spark.sql` users
  * get the same kernels as the Column API. (The sketch BUILDERS stay
  * Column-API-only — aggregates with config parameters don't fit the
  * 2-arg scalar registration shape.)
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time, or
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descs.foreach(ext.injectFunction)
    // joins the operator-optimization fixpoint batch: length-gap prebounds
    // for indel_ratio / levenshtein threshold predicates (idempotent)
    ext.injectOptimizerRule(_ => graft.plans.SimilarityPrefilter)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def binary(name: String, build: Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.functions", name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects exactly 2 arguments")
      build(args)
    })

  /** `char_shingles(text, k)` / `to_bitset(toks, nWords)` — the int
    * argument must be a literal (it shapes the generated kernel call,
    * not per-row data).
    */
  private def intLit(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn's int argument must be an integer literal, got $other")
  }

  /** `kll_sketch_quantiles(sketch, array(...))` — the quantile list must
    * be literal doubles (it shapes the output schema, not per-row data).
    */
  private def doubleSeqLit(fn: String, e: Expression): Seq[Double] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
        // a plain SQL literal like 0.5 parses as DecimalType, whose
        // Literal value is Spark's internal Decimal — the shape every
        // undecorated `array(0.25, 0.5)` call actually produces
        case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal, _) =>
          v.toDouble
        case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) =>
          v.doubleValue()
        case other => throw new IllegalArgumentException(
          s"$fn's quantiles must be double literals, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn's second argument must be array(<double literals>), got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "indel_ratio" -> (args => IndelRatio(args(0), args(1))),
    "token_sort_ratio" -> (args => TokenSortRatio(args(0), args(1))),
    "char_shingles" -> (args => CharShingles(args(0), intLit("char_shingles", args(1)))),
    "sorted_intersect_count" -> (args => SortedIntersectCount(args(0), args(1))),
    "sorted_intersect_count_int" -> (args => SortedIntersectCountInt(args(0), args(1))),
    "sorted_intersect_count_long" -> (args => SortedIntersectCountLong(args(0), args(1))),
    "double_dot" -> (args => DoubleDot(args(0), args(1))),
    "to_bitset" -> (args => ToBitset(args(0), intLit("to_bitset", args(1)))),
    "bitset_and_count" -> (args => BitsetAndCount(args(0), args(1))),
    "cm_inner_product" -> (args => CmInnerProduct(args(0), args(1))),
    "kll_sketch_quantiles" -> (args =>
      KllSketchQuantiles(args(0), doubleSeqLit("kll_sketch_quantiles", args(1)))),
    "minhash_sig" -> (args =>
      MinHashExpression.sigExpr(args(0), intLit("minhash_sig", args(1)), seed = 42L)))

  private[graft] val descs = builders.map { case (name, build) =>
    binary(name, build)
  }

  /** Register on an existing session (idempotent): the SQL functions plus
    * the [[graft.plans.SimilarityPrefilter]] optimizer rule (live sessions
    * can't extend the injected rule sets, so the rule rides
    * `experimental.extraOptimizations` instead — same rule object, later
    * batch, identical rewrites).
    */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, build, "scala_udf")
    }
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.SimilarityPrefilter))
      spark.experimental.extraOptimizations = extra :+ graft.plans.SimilarityPrefilter
  }
}
