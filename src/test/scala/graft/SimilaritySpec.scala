package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimKernel, Similarity}

class SimilaritySpec extends SparkSpec {

  // Golden values from an independent LCS-based indel implementation
  // (rapidfuzz fuzz.ratio / fuzz.token_sort_ratio semantics).
  val golden: Seq[(String, String, Double, Double)] = Seq(
    ("smith, john", "john smith", 47.61904761904761, 95.23809523809523),
    ("elon musk", "musk, elon", 42.10526315789473, 94.73684210526316),
    ("john smith", "jon smith", 94.73684210526316, 94.73684210526316),
    ("abc", "abc", 100.0, 100.0),
    ("", "", 100.0, 100.0),
    ("a", "", 0.0, 0.0),
    ("new york", "york new", 50.0, 100.0),
    ("kitten", "sitting", 61.53846153846154, 61.53846153846154),
    ("robert de niro", "de niro robert", 50.0, 100.0),
    ("alpha beta", "gamma delta", 57.14285714285714, 38.095238095238095))

  test("SimKernel indel ratio matches golden (kernel level)") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    for ((a, b, r, tsr) <- golden) {
      assert(math.abs(SimKernel.indelRatio100(u(a), u(b)) - r) < 1e-9, s"ratio($a, $b)")
      assert(math.abs(SimKernel.tokenSortRatio100(u(a), u(b)) - tsr) < 1e-9, s"tsr($a, $b)")
    }
  }

  test("catalyst expressions match golden through a real plan (codegen path)") {
    import spark.implicits._
    val df = golden.map { case (a, b, _, _) => (a, b) }.toDF("a", "b")
    val rows = df.select(
      Similarity.indelRatio(col("a"), col("b")).as("r"),
      Similarity.tokenSortRatio(col("a"), col("b")).as("tsr")).collect()
    for (((a, b, r, tsr), row) <- golden.zip(rows)) {
      assert(math.abs(row.getDouble(0) - r) < 1e-9, s"expr ratio($a, $b)")
      assert(math.abs(row.getDouble(1) - tsr) < 1e-9, s"expr tsr($a, $b)")
    }
  }

  test("astral (non-BMP) inputs measure in code points, not UTF-16 units") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val clef = "𝄞" // 𝄞 U+1D11E — one code point, two UTF-16 chars
    // [𝄞, x] vs [x, 𝄞, x]: LCS = 2 code points, dist = 1, total = 5 → 80.0.
    // A UTF-16-unit DP would say 100 * (1 - 1/7) ≈ 85.71 (rapidfuzz
    // disagrees: Python strings are code-point sequences).
    assert(math.abs(
      SimKernel.indelRatio100(u(clef + "x"), u("x" + clef + "x")) - 80.0) < 1e-9)
    assert(SimKernel.indelRatio100(u(clef), u(clef)) == 100.0)
    assert(SimKernel.tokenSortRatio100(u("b " + clef), u(clef + " b")) == 100.0)
    // token SORT ORDER is code-point order (Python's), not UTF-16 unit
    // order: U+FFFD (65533) sorts BEFORE U+1D11E (119070), though its
    // UTF-16 unit 0xFFFD sorts after the clef's lead surrogate 0xD834
    assert(SimKernel.tokenSortKey(clef + " �") == "� " + clef)
    // the Fast variants' length-gap prebound (Spark length() = code
    // points) must never prune a pair the exact kernel keeps
    import spark.implicits._
    val df = Seq((clef + "x", "x" + clef + "x")).toDF("a", "b")
    val both = df.select(
      Similarity.indelRatio(col("a"), col("b")).as("exact"),
      Similarity.indelRatioFast(col("a"), col("b"), minKeep = 75.0).as("fast")).head
    assert(both.getDouble(0) == both.getDouble(1))
  }

  test("null inputs yield null, not crash") {
    import spark.implicits._
    val df = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    val r = df.select(Similarity.indelRatio(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("weighted similarity renormalizes over present fields") {
    import spark.implicits._
    // name matches 100, title blank on one side → weight renormalizes to
    // name .5 / company .1 → (100*.5 + 0*.1)/.6
    val df = Seq(("ann lee", "ann lee", "", "ceo", "acme", "globex")).toDF(
      "name_a", "name_b", "title_a", "title_b", "co_a", "co_b")
    val score = Similarity.weightedSimilarity(Seq(
      Similarity.WeightedField(col("name_a"), col("name_b"), 0.5, Similarity.levRatio),
      Similarity.WeightedField(col("title_a"), col("title_b"), 0.15, Similarity.levRatio),
      Similarity.WeightedField(col("co_a"), col("co_b"), 0.1,
        (a, b) => when(a === b, 100.0).otherwise(0.0))))
    val got = df.select(score).head.getDouble(0)
    assert(math.abs(got - (100 * 0.5) / 0.6) < 1e-9)
  }

  test("weighted similarity with all fields absent is 0.0") {
    import spark.implicits._
    val df = Seq(("", "", "", "")).toDF("a1", "b1", "a2", "b2")
    val score = Similarity.weightedSimilarity(Seq(
      Similarity.WeightedField(col("a1"), col("b1"), 0.5, Similarity.levRatio),
      Similarity.WeightedField(col("a2"), col("b2"), 0.5, Similarity.levRatio)))
    assert(df.select(score).head.getDouble(0) == 0.0)
  }
}
