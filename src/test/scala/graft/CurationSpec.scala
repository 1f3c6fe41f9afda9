package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Chunker, Dedup, Funnel, Sampling}

/** Curation-tier operators: incremental dedup, deterministic sampling,
  * n-gram stats, funnel conversions, context-window chunking.
  */
class CurationSpec extends SparkSpec {

  // ---------------------------------------------------------------- sampling

  test("hash bucket matches the reference md5 arithmetic") {
    import spark.implicits._
    // md5('graft:42')[:8] = 'eff2d19d' -> 4025602461 % 100 = 97
    val b = Seq(42L).toDF("k").select(Sampling.hashBucket(col("k"))).head().getLong(0)
    assert(b == 97L)
  }

  test("stratified sample is deterministic and partition-independent") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("k").withColumn("s", (col("k") % 3).cast("string"))
    val rates = Map("0" -> 25, "1" -> 75)
    def ids(parts: Int) =
      Sampling.stratifiedHash(df.repartition(parts), col("k"), col("s"), rates, defaultPct = 50)
        .select("k").collect().map(_.getLong(0)).toSet
    val once = ids(2)
    assert(once == ids(7), "sample membership must not depend on layout")
    // rate sanity: each stratum within a loose band of its expectation
    val byStratum = once.groupBy(_ % 3).map { case (s, ks) => s -> ks.size }
    assert(math.abs(byStratum(0L) - 334 * 0.25) < 40)
    assert(math.abs(byStratum(1L) - 333 * 0.75) < 40)
    assert(math.abs(byStratum(2L) - 333 * 0.50) < 45)
  }

  test("lower sampling rates select subsets of higher rates") {
    import spark.implicits._
    val df = (0L until 500L).toDF("k").withColumn("s", lit("x"))
    def ids(pct: Int) =
      Sampling.stratifiedHash(df, col("k"), col("s"), Map.empty, defaultPct = pct)
        .select("k").collect().map(_.getLong(0)).toSet
    assert(ids(0).isEmpty)
    assert(ids(100).size == 500)
    assert(ids(10).subsetOf(ids(30)), "bucket gate must nest across rates")
  }

  // ---------------------------------------------------------------- chunking

  test("chunks cover the text exactly with the configured overlap") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val chunks = Chunker.fixedChunks(Seq((1L, text)).toDF("doc_id", "t"),
        col("doc_id"), col("t"), size = 200, overlap = 40)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    // starts 1, 161, 321 — NOT 481, which would be a pure-overlap chunk
    assert(chunks.length == 3)
    assert(chunks.forall(_.length == 200))
    // consecutive chunks agree on the 40-char overlap
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(40) == b.take(math.min(40, b.length)))
    }
    // stitching chunk 0 + the non-overlap tail of each later chunk
    // reconstructs the document byte-for-byte
    val stitched = chunks.head + chunks.tail.map(_.drop(40)).mkString
    assert(stitched == text)
  }

  test("empty and sub-window texts yield exactly one chunk") {
    import spark.implicits._
    val out = Chunker.fixedChunks(
        Seq((1L, ""), (2L, "tiny")).toDF("doc_id", "t"),
        col("doc_id"), col("t"), size = 200, overlap = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSet == Set((1L, 0, ""), (2L, 0, "tiny")))
  }

  test("chunker rejects overlap >= size") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "t")
    intercept[IllegalArgumentException] {
      Chunker.fixedChunks(df, col("doc_id"), col("t"), size = 100, overlap = 100)
    }
  }

  // ---------------------------------------------------------------- n-grams

  test("word trigrams slide over tokens; short texts yield none") {
    import spark.implicits._
    val out = Seq("The quick  brown fox", "one two", "").toDF("t")
      .select(TextFunctions.wordNgrams(col("t"), 3)).collect()
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("the quick brown", "quick brown fox"))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  // ---------------------------------------------------------------- funnel

  test("funnel keeps the earliest follow within the window, only") {
    import spark.implicits._
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
    val views = Seq(
      (1L, 10L, ts(0)),    // converts: purchases at +60s and +120s -> lag 60
      (1L, 11L, ts(1700)), // no purchase within (t, t+1800]
      (2L, 20L, ts(0)))    // purchase at exactly +1800 -> inclusive bound
      .toDF("key", "id", "ts")
    val purchases = Seq(
      (1L, ts(60)), (1L, ts(120)), (2L, ts(1800)), (3L, ts(30)))
      .toDF("key", "ts")
    val out = Funnel.conversions(views, purchases, windowSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 10L, 60L), (2L, 20L, 1800L)))
  }

  // --------------------------------------------------- decontamination

  test("decontamination counts distinct shared grams, not occurrences") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),        // bench: grams "a b c d e", "b c d e f"
      (10L, "a b c d e f"),        // shares both grams
      (11L, "x a b c d e x a b c d e"), // shares "a b c d e" (twice in text -> once distinct)
      (12L, "totally different words here now"))
      .toDF("doc_id", "text")
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(TextFunctions.wordNgrams(col("text"), 5))).as("gram"))
    val bench = grams(docs.filter(col("doc_id") < 10)).withColumnRenamed("doc_id", "bench_id")
    val out = grams(docs.filter(col("doc_id") >= 10))
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n"), countDistinct(col("bench_id")).as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 2L, 1L), (11L, 1L, 1L)))
  }

  test("repetition ratio flags duplicated trigrams") {
    import spark.implicits._
    val tri = TextFunctions.wordNgrams(col("text"), 3)
    val out = Seq(
      (1L, "a b a b a b a b"),  // 6 trigrams, 2 distinct -> ratio 2/3
      (2L, "all tokens unique here now"),
      (3L, "xy"))               // < 3 tokens -> 0 trigrams, ratio 0
      .toDF("doc_id", "text")
      .select(col("doc_id"), size(tri).as("n"), size(array_distinct(tri)).as("d"))
      .withColumn("r", when(col("n") === 0, 0.0)
        .otherwise(lit(1.0) - col("d").cast("double") / col("n").cast("double")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    assert(out == Set((1L, 6, 2, 1.0 - 2.0 / 6.0), (2L, 3, 3, 0.0), (3L, 0, 0, 0.0)))
  }

  // ---------------------------------------------------- mixture planning

  test("mixture rates clamp at 1 when the stratum can't fill its share") {
    import spark.implicits._
    // 3 langs, token counts 10 / 80 / 10 (total 100, budget 50)
    val docs = Seq(
      ("a", ("w " * 10).trim), ("b", ("w " * 80).trim), ("c", ("w " * 10).trim))
      .toDF("lang", "text")
    val perLang = docs.groupBy("lang")
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"))
    val total = perLang.agg(sum(col("n_tokens")).as("total"))
    val share = when(col("lang") === "a", 0.4).when(col("lang") === "b", 0.4).otherwise(0.2)
    val out = perLang.crossJoin(broadcast(total))
      .withColumn("rate", least(lit(1.0),
        share * 0.5 * col("total").cast("double") / col("n_tokens").cast("double")))
      .collect().map(r => (r.getString(0), r.getAs[Double]("rate"))).toMap
    // a: wants 0.4*50=20 of 10 available -> clamp 1.0
    // b: wants 20 of 80 -> 0.25; c: wants 10 of 10 -> 1.0
    assert(out("a") == 1.0 && out("b") == 0.25 && out("c") == 1.0, out.toString)
  }

  // ---------------------------------------------------- incremental dedup

  test("incremental dedup: batch-internal dups collapse, history dups drop") {
    import spark.implicits._
    val batch = Seq((10L, "AAA"), (11L, "aaa"), (12L, "bbb"), (13L, "ccc"))
      .toDF("id", "text")
    val history = Seq(Tuple1("ccc"), Tuple1("ddd")).toDF("text")
    val out = Dedup.incremental(
        batch, col("id"), lower(col("text")), history, lower(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "aaa" keeps min-id 10 with multiplicity 2; "bbb" is novel; "ccc" is
    // already in history and must not surface
    assert(out == Set((10L, 2L), (12L, 1L)))
  }
}
