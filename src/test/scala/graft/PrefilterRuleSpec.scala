package graft

import org.apache.spark.sql.catalyst.expressions.{Abs, GreaterThanOrEqual, LessThanOrEqual, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.functions.SimKernel
import graft.plans.SimilarityPrefilter

/** The SimilarityPrefilter optimizer rule: sound length-gap guards are
  * injected for indel_ratio / levenshtein threshold predicates, exactly
  * once, without changing results — including on astral-plane inputs,
  * where an unsound (unit-mismatched) bound would prune real matches.
  */
class PrefilterRuleSpec extends SparkSpec {

  GraftExtensions.register(spark)

  // parquet-backed (a LocalRelation view would be folded away by
  // ConvertToLocalRelation before the guard could be observed in the plan)
  private def pairsView(): Unit = {
    import spark.implicits._
    val path = "/tmp/graft_prefilter_pairs"
    Seq(
      ("john smith", "jon smith"),     // ratio 94.7, lev 1
      ("john smith", "smith, john"),   // ratio 47.6
      ("alpha", "alphabetagamma"),     // big length gap → guard prunes
      ("𝄞x", "x𝄞x"),                   // astral: ratio 80.0 in code points
      ("abc", "abc"))                  // identical
      .toDF("a", "b").write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("pairs")
  }

  /** Conjuncts of guard shape anywhere in the optimized plan (every
    * node's expressions — guards can sit in a mid-plan Filter or Join).
    */
  private def indelGuards(plan: LogicalPlan): Seq[Any] =
    plan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case g @ GreaterThanOrEqual(Multiply(_, _, _), _) => g
      })
    }.flatten

  private def levGuards(plan: LogicalPlan): Seq[Any] =
    plan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case g @ LessThanOrEqual(Abs(_, _), _) => g
      })
    }.flatten

  test("indel_ratio threshold predicate gains exactly one length-gap guard") {
    pairsView()
    val df = spark.sql("SELECT a, b FROM pairs WHERE indel_ratio(a, b) >= 92.0")
    val plan = df.queryExecution.optimizedPlan
    assert(indelGuards(plan).size == 1, plan.toString)
    // re-optimizing the already-optimized plan must not stack a second guard
    val again = spark.sessionState.optimizer.execute(plan)
    assert(indelGuards(again).size == 1, again.toString)
  }

  test("guarded query returns exactly the kernel's answer (incl. astral pair)") {
    pairsView()
    val got = spark.sql("SELECT a, b FROM pairs WHERE indel_ratio(a, b) >= 75.0")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val want = Seq(
      ("john smith", "jon smith"), ("john smith", "smith, john"),
      ("alpha", "alphabetagamma"), ("𝄞x", "x𝄞x"), ("abc", "abc"))
      .filter { case (a, b) => SimKernel.indelRatio100(u(a), u(b)) >= 75.0 }.toSet
    assert(got == want)
    assert(got.contains(("𝄞x", "x𝄞x")), "sound guard must keep the astral pair")
  }

  test("levenshtein threshold predicate gains the integer length-gap guard") {
    pairsView()
    val df = spark.sql("SELECT a, b FROM pairs WHERE levenshtein(a, b) <= 2")
    val plan = df.queryExecution.optimizedPlan
    assert(levGuards(plan).size == 1, plan.toString)
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // 𝄞x → x𝄞x is one code-point insert: a guard in UTF-16 units (gap 2)
    // would have been fine here, but a code-point guard is what matches
    // Spark's code-point levenshtein kernel
    assert(got == Set(
      ("john smith", "jon smith"), ("𝄞x", "x𝄞x"), ("abc", "abc")))
  }

  test("narrow (TINYINT) threshold: guard widens the literal UP, never the gap down") {
    // a >127 length gap downcast to TINYINT would throw under ANSI (Spark 4
    // default) or wrap non-ANSI — on a query that ran fine without the
    // guard. The fix compares in IntegerType by widening the literal.
    import spark.implicits._
    val path = "/tmp/graft_prefilter_wide_pairs"
    Seq(("x", "x" * 300), ("abc", "abd")) // gap 299 vs gap 0
      .toDF("a", "b").write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("wide_pairs")
    val df = spark.sql(
      "SELECT a, b FROM wide_pairs WHERE levenshtein(a, b) <= CAST(2 AS TINYINT)")
    assert(levGuards(df.queryExecution.optimizedPlan).size == 1)
    val got = df.collect().map(_.getString(0)).toSet // must not throw
    assert(got == Set("abc"))
  }

  test("token_sort_ratio predicates are left alone (no sound cheap bound)") {
    pairsView()
    val plan = spark.sql("SELECT a FROM pairs WHERE token_sort_ratio(a, b) >= 90.0")
      .queryExecution.optimizedPlan
    assert(indelGuards(plan).isEmpty, plan.toString)
  }

  test("guard lands in join conditions too") {
    pairsView()
    val df = spark.sql(
      """SELECT l.a, r.b FROM pairs l JOIN pairs r
        |ON length(l.a) = length(r.b) AND indel_ratio(l.a, r.b) >= 92.0""".stripMargin)
    val plan = df.queryExecution.optimizedPlan
    assert(indelGuards(plan).size == 1, plan.toString)
    // and the join result is what the kernel says
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(got.forall { case (a, b) => SimKernel.indelRatio100(u(a), u(b)) >= 92.0 })
    assert(got.contains(("abc", "abc")))
  }

  test("q144's SQL-surface plan carries the injected guard and yields rows") {
    val q = graft.queries.MiningOps.all.find(_.name == "q144_lev_band_pairs").get
    val df = q.run(spark, sfDir)
    assert(levGuards(df.queryExecution.optimizedPlan).nonEmpty,
      df.queryExecution.optimizedPlan.toString)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 3))
  }

  test("q161's SQL-surface plan carries the injected indel guard and yields rows") {
    val q = graft.queries.MiningOps.all.find(_.name == "q161_indel_sql_pairs").get
    val df = q.run(spark, sfDir)
    // the rule, not a hand-written conjunct, makes the DP feasible: the
    // optimized plan must carry the 100*(1 - gap/total) prebound
    assert(indelGuards(df.queryExecution.optimizedPlan).nonEmpty,
      df.queryExecution.optimizedPlan.toString)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) >= 65.0))
  }

  test("rule object is a no-op on guard-free plans") {
    pairsView()
    val plan = spark.sql("SELECT a FROM pairs WHERE length(a) > 2")
      .queryExecution.optimizedPlan
    assert(SimilarityPrefilter(plan).fastEquals(plan))
  }
}
