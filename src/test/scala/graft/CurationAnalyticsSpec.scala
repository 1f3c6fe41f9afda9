package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the q85-q92 curation/analytics surface: every query is
  * oracle-checked by the driver, so these specs focus on what the oracle
  * can't see — determinism under re-partitioning, agreement with an
  * independent in-memory brute force, and the plan shapes the 100 TB story
  * depends on (broadcast term/stats tables, no nested loops).
  */
class CurationAnalyticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def plan(name: String): String =
    q(name).queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  // ---------------------------------------------------------------- q85
  test("q85 mixture resample: rates capped, kept within totals, deterministic") {
    val rows = q("q85_mixture_resample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, rate, nKept, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(rate >= 0 && rate <= 100, s"rate out of range: $r")
      assert(nKept <= nDocs && kept <= total, s"kept exceeds totals: $r")
      // the hash gate is uniform: kept fraction tracks the rate loosely
      // even at 500-doc strata (bound is wide on purpose — not a tautology
      // of the gate, just a sanity net against an inverted comparison)
      if (rate == 100) assert(nKept == nDocs, s"rate 100 must keep all: $r")
      if (rate == 0) assert(nKept == 0L, s"rate 0 must keep none: $r")
    }
    // membership is a pure function of (key, salt): identical across runs
    assert(q("q85_mixture_resample").collect().toSeq == rows.toSeq)
  }

  // ---------------------------------------------------------------- q86
  test("q86 shard manifest: covers every doc; digest pinpoints a mutated shard") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = q("q86_shard_manifest").collect()
    assert(m.map(_.getLong(1)).sum == docs.count())
    assert(m.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))

    // corrupt ONE document's text in a copied fixture dir: exactly the
    // manifests of that doc's shard may change, every other shard's
    // (n_docs, digest) row must be byte-identical
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards").toString
    docs.withColumn("text",
        when(col("doc_id") === 7, concat(col("text"), lit(" corrupted"))).otherwise(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m2 = SparkEntry.queries("q86_shard_manifest")(spark, tmp).collect()
    val before = m.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val after = m2.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val changed = before.keySet.filter(s => before(s) != after(s))
    assert(changed.size == 1, s"exactly one shard must change, got $changed")
    assert(before(changed.head)._1 == after(changed.head)._1, "row count unchanged")
  }

  // ---------------------------------------------------------------- q87
  test("q87 boolean search: hits contain ALL terms, misses lack one (exhaustive)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.split("\\s+").toSet).toMap
    val queries = Map(
      1 -> Set("spark", "hash", "merge"),
      2 -> Set("window", "sort", "batch"),
      3 -> Set("table", "scan", "row", "fast"))
    val hits = q("q87_boolean_search").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    for ((qid, terms) <- queries; (docId, toks) <- docs) {
      val expected = terms.subsetOf(toks)
      assert(hits.contains((qid, docId)) == expected,
        s"qid=$qid doc=$docId expected=$expected")
    }
  }

  test("q87/q88 retrieval plans broadcast the term table, no nested loops") {
    Seq("q87_boolean_search", "q88_keyword_topk").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: $p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: $p")
    }
  }

  // ---------------------------------------------------------------- q88
  test("q88 keyword top-k agrees with an in-memory brute force") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.split("\\s+").toSeq
        .filter(_.nonEmpty)).toMap
    val queries = Map(1 -> Seq("spark", "shuffle"), 2 -> Seq("hash", "merge"),
      3 -> Seq("window", "stream"))
    val n = docs.size.toLong
    // df per term over matched docs; scaled-integer idf; integer scores
    val allTerms = queries.values.flatten.toSet
    val dfCount = allTerms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def idf(t: Long) = ((2 * (n - t) + 1) * 1000000L) / (2 * t + 1)
    val expected = queries.flatMap { case (qid, terms) =>
      docs.toSeq.flatMap { case (d, toks) =>
        val score = terms.filter(t => dfCount(t) > 0 && toks.contains(t))
          .map(t => toks.count(_ == t).toLong * idf(dfCount(t))).sum
        if (score > 0) Some((qid, d, score)) else None
      }.sortBy { case (_, d, s) => (-s, d) }.take(10)
        .zipWithIndex.map { case ((_, d, s), i) => (qid, d, s, i + 1) }
    }.toSet
    val got = q("q88_keyword_topk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected,
      s"diff: got-only=${got -- expected}, expected-only=${expected -- got}")
  }

  // ---------------------------------------------------------------- q89
  test("q89 transitions: totals equal per-user event counts minus one") {
    val ev = graft.core.Tables(spark, sfDir).events
    val expected = ev.groupBy("user_id").count()
      .agg(sum(greatest(col("count") - 1, lit(0L)))).head.getLong(0)
    val got = q("q89_transition_matrix").agg(sum("n_transitions")).head.getLong(0)
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q90
  test("q90 cube: levels reconcile (cells sum to margins sum to grand total)") {
    val rows = q("q90_cube_orders").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    val byLevel = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    // level 0 = cells, 1 = per-priority, 2 = per-status, 3 = grand total
    assert(byLevel.keySet == Set(0L, 1L, 2L, 3L), byLevel.toString)
    assert(byLevel(0L) == byLevel(3L) && byLevel(1L) == byLevel(3L)
      && byLevel(2L) == byLevel(3L), byLevel.toString)
    val total = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(byLevel(3L) == total)
  }

  // ---------------------------------------------------------------- q91
  test("q91 rolling window agrees with a brute-force trailing-hour count") {
    val ev = graft.core.Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.map { case (id, u, ms) =>
      id -> ev.count { case (_, u2, ms2) => u2 == u && ms2 <= ms && ms2 >= ms - 3600000L }.toLong
    }.toMap
    val got = q("q91_rolling_activity").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q92
  test("q92 outliers match a brute-force 3-sigma check; stats join broadcasts") {
    val ev = graft.core.Tables(spark, sfDir).events
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val n = rows.length.toDouble
      // mirror the query's exact-decimal moments (sum order must not matter)
      val s = rows.map(r => BigDecimal(r._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val qq = rows.map(r => BigDecimal(r._3 * r._3).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val mean = s / n
      val variance = math.max(qq / n - mean * mean, 0.0)
      rows.filter(r => (r._3 - mean) * (r._3 - mean) > 9.0 * variance).map(_._1).toSeq
    }.toSet
    val got = q("q92_value_outliers").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"diff: ${got.diff(expected)} / ${expected.diff(got)}")
    assert(plan("q92_value_outliers").contains("BroadcastHashJoin"))
  }

  // ---------------------------------------------------------------- q93
  test("q93 cohorts: day-0 actives per cohort sum to the distinct user count") {
    val rows = q("q93_cohort_retention").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val users = graft.core.Tables(spark, sfDir).events
      .select("user_id").distinct().count()
    // every user is active on their own cohort day exactly once
    assert(rows.filter(_._2 == 0L).map(_._3).sum == users)
    // actives at any offset never exceed the cohort's day-0 size
    val day0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (c, _, n) => assert(n <= day0(c), s"cohort $c: $n > ${day0(c)}") }
  }

  // ---------------------------------------------------------------- q94
  test("q94 session outliers sit 3 sigma above the q51 session population") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val durations = q("q51_sessionize").collect().map { r =>
      val s = java.time.LocalDateTime.parse(r.getString(2), fmt)
      val e = java.time.LocalDateTime.parse(r.getString(3), fmt)
      ((r.getLong(0), r.getLong(1)), java.time.Duration.between(s, e).getSeconds)
    }.toMap
    val n = durations.size.toDouble
    val mean = durations.values.map(BigDecimal(_)).sum.toDouble / n
    val meanSq = durations.values.map(d => BigDecimal(d) * BigDecimal(d)).sum.toDouble / n
    val variance = math.max(meanSq - mean * mean, 0.0)
    val expected = durations.filter { case (_, d) =>
      (d - mean) * (d - mean) > 9.0 * variance && d > mean
    }.keySet
    val got = q("q94_session_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"diff: ${got.diff(expected)} / ${expected.diff(got)}")
  }

  // ---------------------------------------------------------------- q95
  test("q95 token lift agrees with an in-memory brute force") {
    val docTokens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).toSet).toMap
    val n = docTokens.size.toLong
    val df = docTokens.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val topf = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(200).toMap
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    for (toks <- docTokens.values; a <- toks if topf.contains(a);
         b <- toks if topf.contains(b) && a < b)
      pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + 1
    val expected = pairCounts.toSeq.map { case ((a, b), nab) =>
      (a, b, nab,
        math.floor(nab.toDouble * n.toDouble * 1000000.0
          / (topf(a) * topf(b)).toDouble).toLong)
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(50).toSet
    val got = q("q95_token_lift").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"diff: ${got.diff(expected)} / ${expected.diff(got)}")
  }

  // ---------------------------------------------------------------- q98
  test("q98 PIT enrichment: every lineitem hits exactly one history run, no nested loop") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val got = q("q98_pit_enrich").collect()
    // runs partition [first_order, infinity) per customer half-open, and
    // pre-history facts take the NULL group — so nothing duplicates and
    // nothing drops: group counts sum exactly to the fact count
    assert(got.map(_.getLong(1)).sum == li, s"PIT join must be 1:1 with facts")
    assert(got.exists(_.isNullAt(0)),
      "fixture ships some lines before the first run: NULL state group expected")
    val p = plan("q98_pit_enrich")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the entity key must carry the join: " + p)
  }

  // ---------------------------------------------------------------- q96
  test("q96 hourly anomalies agree with a brute-force trailing baseline") {
    val hours = graft.core.Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        unix_millis(date_trunc("hour", col("ts"))).as("h")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hours.flatMap { case (t, h, c) =>
      val win = hours.filter { case (t2, h2, _) =>
        t2 == t && h2 >= h - 86400000L && h2 <= h - 3600000L }
      val (sum, nw) = (win.map(_._3).sum, win.length.toLong)
      if (nw >= 6 && c * nw > 2 * sum) Some((t, h)) else None
    }.toSet
    val got = q("q96_hourly_anomaly").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"diff: ${got.diff(expected)} / ${expected.diff(got)}")
  }

  // --------------------------------------------------------------- q121
  test("q121 EWMA: matches a local sequential recurrence per user") {
    val rows = q("q121_ewma_value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    // recompute locally: sort each user's timeline, fold s = 0.2x + 0.8s
    val ev = graft.core.Tables(spark, sfDir).events
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ms"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(1 - 1), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val local = ev.groupBy(_._1).map { case (u, es) =>
      val vals = es.sortBy(e => (e._2, e._3)).map(_._4)
      u -> (es.length.toLong,
        math.rint(vals.reduceLeft((s, x) => 0.2 * x + 0.8 * s) * 1e6) / 1e6)
    }
    assert(rows.keySet == local.keySet)
    local.foreach { case (u, (n, e)) =>
      assert(rows(u)._1 == n, s"user $u count")
      assert(math.abs(rows(u)._2 - e) < 1e-9, s"user $u ewma ${rows(u)._2} vs $e")
    }
  }
}
