package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.IndelRatio

/** Optimizer rule: derive cheap length-gap prebounds for expensive
  * similarity-threshold predicates, so the O(n·m) edit-distance kernel
  * never runs on pairs the lengths alone already rule out.
  *
  * The engine's own operators apply this bound by hand
  * (`Similarity.indelRatioFast`, the fuzzy-join length band in
  * `queries/ReferenceOps`); this rule gives the same pruning to anyone
  * writing plain `spark.sql` against the `GraftExtensions` surface — the
  * declared-plan/Catalyst division of labor the engine is built on.
  *
  * Two rewrites, both conjunct-prepends that short-circuit in generated
  * code before the DP kernel evaluates:
  *
  *  - `indel_ratio(a, b) >= t`  gains
  *    `100 * (1 - |len(a)-len(b)| / greatest(len(a)+len(b), 1)) >= t`,
  *    sound because the indel distance is at least the length gap and
  *    the ratio denominator is exactly `len(a)+len(b)` — both measured
  *    in code points on both sides (`SimKernel` and Spark's `length`).
  *  - `levenshtein(a, b) <= k`  gains `|len(a)-len(b)| <= k`, sound
  *    because every edit changes the length by at most one (Spark's
  *    kernel is code-point-based, matching `length`).
  *
  * `token_sort_ratio` is deliberately NOT rewritten: its DP runs over
  * whitespace-collapsed token-sort keys whose lengths differ from the
  * raw columns', so no sound bound is available without computing the
  * key — which costs what the guard is meant to save.
  *
  * Soundness of placement: each guard g is implied by its conjunct c on
  * non-null inputs, and both are null-intolerant in the same columns, so
  * `g AND c ≡ c` in three-valued logic — the rewrite is semantics-
  * preserving anywhere a predicate lives, including outer-join
  * conditions. Guards are only added when the inputs are deterministic
  * (duplicating a nondeterministic expression would change its sampling)
  * and when not already present (`semanticEquals` keeps the rule
  * idempotent under the optimizer's fixpoint batch).
  */
object SimilarityPrefilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = withGuards(cond)
      if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = withGuards(cond)
      if (rewritten.fastEquals(cond)) j else j.copy(condition = Some(rewritten))
  }

  private def withGuards(cond: Expression): Expression = {
    val conjuncts = splitConjuncts(cond)
    val guards = conjuncts.flatMap(guardFor).filterNot { g =>
      conjuncts.exists(_.semanticEquals(g))
    }.distinct
    if (guards.isEmpty) cond else (guards :+ cond).reduceLeft(And)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** The cheap necessary condition implied by one conjunct, if any. */
  private def guardFor(conjunct: Expression): Option[Expression] = conjunct match {
    // indel_ratio(a, b) >= t   (and the mirrored / strict forms)
    case GreaterThanOrEqual(IndelRatio(a, b), DoubleLit(t)) => indelGuard(a, b, t, strict = false)
    case GreaterThan(IndelRatio(a, b), DoubleLit(t))        => indelGuard(a, b, t, strict = true)
    case LessThanOrEqual(DoubleLit(t), IndelRatio(a, b))    => indelGuard(a, b, t, strict = false)
    case LessThan(DoubleLit(t), IndelRatio(a, b))           => indelGuard(a, b, t, strict = true)
    // levenshtein(a, b) <= k   (and the mirrored / strict forms);
    // thresholded levenshtein(a, b, k) already prunes internally — skip
    case LessThanOrEqual(Levenshtein(a, b, None), k @ IntegralLit()) => levGuard(a, b, k, strict = false)
    case LessThan(Levenshtein(a, b, None), k @ IntegralLit())        => levGuard(a, b, k, strict = true)
    case GreaterThanOrEqual(k @ IntegralLit(), Levenshtein(a, b, None)) => levGuard(a, b, k, strict = false)
    case GreaterThan(k @ IntegralLit(), Levenshtein(a, b, None))        => levGuard(a, b, k, strict = true)
    case _ => None
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case Literal(v: Float, FloatType)   => Some(v.toDouble)
      case Literal(v: Int, IntegerType)   => Some(v.toDouble)
      case Literal(v: Long, LongType)     => Some(v.toDouble)
      case Literal(v: Decimal, _: DecimalType) => Some(v.toDouble)
      case _ => None
    }
  }

  private object IntegralLit {
    def unapply(e: Expression): Boolean = e match {
      case Literal(_, IntegerType | LongType | ShortType | ByteType) => true
      case _ => false
    }
  }

  /** `100 * (1 - |la-lb| / greatest(la+lb, 1)) {>=,>} t`, doubles throughout.
    * Skipped for t <= 0 (vacuously true — plan noise, no pruning).
    */
  private def indelGuard(a: Expression, b: Expression, t: Double, strict: Boolean): Option[Expression] = {
    if (t <= 0.0 || !a.deterministic || !b.deterministic) return None
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    val cap = Multiply(
      Literal(100.0, DoubleType),
      Subtract(
        Literal(1.0, DoubleType),
        Divide(
          Abs(Subtract(la, lb)),
          Greatest(Seq(Add(la, lb), Literal(1.0, DoubleType))))))
    Some(if (strict) GreaterThan(cap, Literal(t, DoubleType))
         else GreaterThanOrEqual(cap, Literal(t, DoubleType)))
  }

  /** `|len(a) - len(b)| {<=,<} k`. The comparison happens in the WIDER of
    * (IntegerType, k's type): a TINYINT/SMALLINT threshold is widened UP to
    * the gap's IntegerType — never the gap cast DOWN to a narrow type, which
    * would wrap (non-ANSI) or throw (ANSI) when the gap exceeds the narrow
    * range, making the injected guard fail a query that ran fine without it.
    */
  private def levGuard(a: Expression, b: Expression, k: Expression, strict: Boolean): Option[Expression] = {
    if (!a.deterministic || !b.deterministic) return None
    val gapInt: Expression = Abs(Subtract(Length(a), Length(b)))
    val narrow = k.dataType == ByteType || k.dataType == ShortType
    val (gap, kk): (Expression, Expression) =
      if (k.dataType == IntegerType) (gapInt, k)
      else if (narrow) (gapInt, Cast(k, IntegerType))
      else (Cast(gapInt, k.dataType), k) // LONG/DOUBLE threshold: widen the gap
    Some(if (strict) LessThan(gap, kk) else LessThanOrEqual(gap, kk))
  }
}
