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

  test("funnel keeps the earliest follow within the window, at full precision") {
    import spark.implicits._
    def ts(s: Int, ms: Int = 0) = {
      val t = java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
      t.setNanos(ms * 1000000); t
    }
    val views = Seq(
      (1L, 10L, ts(0)),        // converts: purchases at +60s and +120s -> lag 60
      (1L, 11L, ts(1700)),     // no purchase within [t, t+1800]
      (2L, 20L, ts(0)),        // purchase at exactly +1800 -> inclusive bound
      (4L, 40L, ts(9, 500)))   // sub-second lag: purchase 300ms later
      .toDF("key", "id", "ts")
    val purchases = Seq(
      (1L, ts(60)), (1L, ts(120)), (2L, ts(1800)), (3L, ts(30)),
      (4L, ts(9, 800)))
      .toDF("key", "ts")
    val out = Funnel.conversions(views, purchases, windowSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // sub-second pairs must survive (the streaming twin pairs them too)
    assert(out == Set((1L, 10L, 60.0), (2L, 20L, 1800.0), (4L, 40L, 0.3)))
  }

  // --------------------------------------------------- decontamination

  /** Stage a controlled documents table so tests can run the SHIPPED
    * query functions (not re-implementations of them) against it.
    */
  private def docsFixture(rows: (Long, String, String)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toSeq.map { case (id, text, lang) => (id, text, lang, "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def runQuery(name: String, dir: String) =
    queries.LlmOps.all.find(_.name == name).get.run(spark, dir)

  test("q148 rebalance: shards [0,16) are stable under the grow; movement ~ 1/3") {
    val rows = queries.CurationOps.all.find(_.name == "q148_rebalance_plan").get
      .run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // rendezvous subset stability, exactly: a key whose 24-way winner is
    // an old shard cannot have had a different 16-way winner
    assert(rows.forall { case (o, n, _) => n >= 16 || o == n })
    val total = rows.map(_._3).sum
    val moved = rows.filter { case (o, n, _) => o != n }.map(_._3).sum
    assert(total > 0)
    val frac = moved.toDouble / total
    assert(frac > 0.1 && frac < 0.6, s"moved fraction $frac") // E = 1/3
  }

  test("q145 nDCG/MRR match hand-computed integer DCG sums") {
    // qid 1 terms {spark, shuffle}; hash/merge/window/stream absent so
    // only qid 1 emits. N=5, df(spark)=1, df(shuffle)=3:
    //   idf(spark)  = (9·10⁶) div 3 = 3,000,000
    //   idf(shuffle)= (5·10⁶) div 7 =   714,285
    // scores: d2=7·714285=4,999,995 > d1=3,000,000 > d3=1,428,570 >
    //         d4=714,285 → ranker order d2,d1,d3,d4; rel = 7,1,2,1.
    //   DCG  = 7·W1 + 1·W2 + 2·W3 + 1·W4 = 9,061,607
    //   IDCG (rel order d2,d3,d1,d4) = 7·W1 + 2·W2 + 1·W3 + 1·W4
    //        = 9,192,537
    // MRR: rel ≥ 6 first at rank 1 → 10⁶.
    val dir = docsFixture(
      (1L, "spark aa bb", "en"),
      (2L, "shuffle shuffle shuffle shuffle shuffle shuffle shuffle", "en"),
      (3L, "shuffle shuffle cc", "en"),
      (4L, "shuffle dd", "en"),
      (5L, "nothing here", "en"))
    val rows = queries.CurationOps.all.find(_.name == "q145_retrieval_ndcg").get
      .run(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(0) == 1)
    assert(r.getDouble(1) == 9061607.0 / 9192537.0)
    assert(r.getLong(2) == 1000000L)
    assert(r.getLong(3) == 4L)
  }

  test("q59 counts distinct shared grams, not occurrences") {
    val dir = docsFixture(
      (0L, "a b c d e f", "en"),        // bench: grams "a b c d e", "b c d e f"
      (10L, "a b c d e f", "en"),        // shares both grams
      (11L, "x a b c d e x a b c d e", "en"), // shares "a b c d e" (twice -> once distinct)
      (12L, "totally different words here now", "en"))
    val out = runQuery("q59_decontamination", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 2L, 1L), (11L, 1L, 1L)))
  }

  test("q60 repetition ratio flags duplicated trigrams") {
    val dir = docsFixture(
      (1L, "a b a b a b a b", "en"),  // 6 trigrams, 2 distinct -> ratio 2/3
      (2L, "all tokens unique here now", "en"),
      (3L, "xy", "en"))               // < 3 tokens -> 0 trigrams, ratio 0
    val out = runQuery("q60_repetition_filter", dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, 6, 2, 1.0 - 2.0 / 6.0, true),
      (2L, 3, 3, 0.0, false),
      (3L, 0, 0, 0.0, false)))
  }

  // ---------------------------------------------------- mixture planning

  test("q61 mixture rates clamp at 1 when the stratum can't fill its share") {
    // q61's fixed shares: en 0.5, zh 0.1, else 0.15; budget = total/2.
    // Token counts 10 / 80 / 10 -> total 100, budget 50:
    //   en wants 0.5*50=25 of 10 available -> clamp 1.0
    //   zh wants 5 of 80 -> 0.0625
    //   fr wants 7.5 of 10 -> 0.75
    val dir = docsFixture(
      (1L, ("w " * 10).trim, "en"),
      (2L, ("w " * 80).trim, "zh"),
      (3L, ("w " * 10).trim, "fr"))
    val out = runQuery("q61_mixture_rates", dir)
      .collect().map(r => (r.getString(0), r.getAs[Double]("rate"))).toMap
    assert(out("en") == 1.0 && out("zh") == 0.0625 && out("fr") == 0.75, out.toString)
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

  test("fixed-k stratified sample is exact-count and partition-independent") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    def sel(parts: Int) = Sampling.fixedPerStratum(
        df.repartition(parts), col("id"), col("s"), k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val one = sel(1)
    assert(one == sel(7)) // layout-independent selection
    assert(one.count(_._2 == "a") == 10 && one.count(_._2 == "b") == 10)
    assert(one.filter(_._2 == "a").map(_._3).toSeq.sorted == (1 to 10))
    // k larger than a stratum returns the whole stratum
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "s")
    assert(Sampling.fixedPerStratum(tiny, col("id"), col("s"), k = 10).count() == 2)
  }

  test("incremental dedup with Bloom prefilter is output-identical") {
    import spark.implicits._
    // enough keys that both prefilter branches (definitely-new and
    // maybe-in-history) are non-trivially populated
    val batch = (1L to 200L).map(i => (i, s"doc_${i % 90}")).toDF("id", "text")
    val history = (0L until 40L).map(i => Tuple1(s"doc_$i")).toDF("text")
    def run(bloom: Option[Long]) = Dedup.incremental(
        batch, col("id"), lower(col("text")), history, lower(col("text")),
        bloomItems = bloom)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = run(None)
    assert(plain == run(Some(1000L)))
    assert(plain.nonEmpty && plain.forall { case (rep, _) => rep % 90 >= 40 || rep >= 90 })
    // empty history: the filter degenerates gracefully (null bitset)
    val empty = history.filter(lit(false))
    val all = Dedup.incremental(batch, col("id"), lower(col("text")),
        empty, lower(col("text")), bloomItems = Some(1000L))
      .collect().map(_.getLong(0)).toSet
    assert(all.size == 90)
  }

  // ---------------------------------------------------- PII redaction

  test("PII redaction masks emails, IPv4s and phone-style numbers") {
    import spark.implicits._
    val cases = Seq(
      ("mail me at jane.doe+spam@corp-mail.co.uk today",
        "mail me at <EMAIL> today"),
      ("server 192.168.001.7 and 10.0.0.1 rebooted",
        "server <IP> and <IP> rebooted"),
      ("call 555-0142 or 555-9999 x2", "call <PHONE> or <PHONE> x2"),
      ("a@b.io 1.2.3.4 555-1234 all three", "<EMAIL> <IP> <PHONE> all three"),
      ("no pii here, just words", "no pii here, just words"),
      ("not-a-phone 5551234 or 12-34; version 1.2.3 stays",
        "not-a-phone 5551234 or 12-34; version 1.2.3 stays"))
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.redactPii(col("t"))).collect().map(_.getString(0))
    for (((_, want), g) <- cases.zip(got)) assert(g == want, s"got '$g'")
    // counts see every match of each type
    val counts = Seq("a@b.io c@d.net 1.2.3.4 555-0000").toDF("t")
      .select(
        TextFunctions.piiCount(col("t"), TextFunctions.EmailRe),
        TextFunctions.piiCount(col("t"), TextFunctions.Ipv4Re),
        TextFunctions.piiCount(col("t"), TextFunctions.PhoneRe))
      .head()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((2L, 1L, 1L)))
  }

  // ------------------------------------------------------------- source cap

  test("q112 per-source cap equals a driver-side reference ranking") {
    val got = SparkEntry.queries("q112_source_cap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    // independent reference: collect the scored fixture and rank locally
    // with plain Scala (sortBy + take), no Spark window involved
    val scored = graft.core.Tables(spark, sfDir).documents
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val want = scored.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, n) => (-n, id) }.take(10).zipWithIndex
        .map { case ((s, id, n), i) => (s, id, n, i + 1) }
    }.toSet
    assert(got == want,
      s"cap diverges from local reference: only-got=${(got -- want).take(5)} only-want=${(want -- got).take(5)}")
    // every source contributes exactly K rows on this fixture (each
    // source has >= K docs), ranks are 1..K
    val bySource = got.groupBy(_._1)
    assert(bySource.values.forall(_.size == 10), bySource.view.mapValues(_.size).toMap.toString)
    assert(bySource.values.forall(_.map(_._4) == (1 to 10).toSet))
  }
}
