package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityAudit

/** Cross-checks for the q133-q138 mining surface. All six are
  * oracle-checked by the driver; these specs cover what the oracle can't:
  * the salted aggregate's exact equality with the plain GROUP BY it
  * protects (the operator's whole contract), brute-force agreement for
  * shingle containment / JS divergence / span coverage, and — for the
  * QualityAudit operator — that injected nulls, dupes, and orphan keys
  * produce exact violation counts (the healthy-fixture query q136 can
  * only show the all-pass face). sf0.001 keeps every brute force
  * trivially collectable.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def tokens(text: String): Array[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)

  // --------------------------------------------------------------- q133
  test("q133 salted agg: bit-identical to the plain GROUP BY it shields") {
    val got = q("q133_salted_user_stats").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val plain = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double"), 6).as("s"),
        max(col("value")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == plain.keySet)
    got.foreach { case (k, v) => assert(v == plain(k), s"user $k: $v vs ${plain(k)}") }
  }

  // --------------------------------------------------------------- q134
  test("q134 shingle containment: matches a driver-side brute force") {
    val rows = q("q134_containment_pairs").collect().sortBy(_.getInt(5))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(5)).toSeq == (1 to rows.length))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1)))
      .filter(_._2.length >= 5)
    val sh: Map[Long, Set[String]] = docs.map { case (id, tk) =>
      id -> tk.sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    val df = sh.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val keep = df.filter { case (_, d) => d >= 2 && d <= 50 }.keySet
    val expected = (for {
      (a, sa) <- sh.iterator if sa.size >= 10
      (b, sb) <- sh if a != b
      common = (sa & sb).count(keep)
      if common > 0
    } yield (a, b, sa.size.toLong, common.toLong,
      common.toDouble / sa.size)).toSeq
      .sortBy { case (a, b, _, _, c) => (-c, a, b) }.take(rows.length)
    rows.zip(expected).foreach { case (r, (a, b, sz, nc, c)) =>
      assert(r.getLong(0) == a && r.getLong(1) == b,
        s"pair mismatch at rank ${r.getInt(5)}: got (${r.getLong(0)},${r.getLong(1)}), want ($a,$b)")
      assert(r.getLong(2) == sz && r.getLong(3) == nc, s"counts mismatch: $r")
      assert(math.abs(r.getDouble(4) - c) < 1e-6, s"containment mismatch: $r vs $c")
    }
  }

  // --------------------------------------------------------------- q135
  test("q135 JS divergence: symmetric-by-construction, bounded, brute-force exact") {
    val rows = q("q135_js_divergence").collect()
    assert(rows.nonEmpty)
    val ln2 = math.log(2.0)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), s"spine must be s1 < s2: $r")
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= ln2 + 1e-9,
        s"JS out of [0, ln2]: $r")
    }
    // brute force: per-source unigram distributions, exact JS
    val bySrc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => tokens(r.getString(1)).map(t => (r.getString(0), t)))
      .groupBy(_._1)
      .map { case (s, xs) =>
        val n = xs.length.toDouble
        s -> xs.groupBy(_._2).map { case (t, ys) => t -> ys.length / n }
      }
    def js(p: Map[String, Double], qq: Map[String, Double]): Double = {
      (p.keySet ++ qq.keySet).iterator.map { t =>
        val (pi, qi) = (p.getOrElse(t, 0.0), qq.getOrElse(t, 0.0))
        val m = (pi + qi) / 2
        (if (pi > 0) 0.5 * pi * math.log(pi / m) else 0.0) +
          (if (qi > 0) 0.5 * qi * math.log(qi / m) else 0.0)
      }.sum
    }
    val nPairs = bySrc.size * (bySrc.size - 1) / 2
    assert(rows.length == nPairs, s"${rows.length} rows != $nPairs source pairs")
    rows.foreach { r =>
      val expected = js(bySrc(r.getString(0)), bySrc(r.getString(1)))
      assert(math.abs(r.getDouble(3) - expected) < 1e-5,
        s"JS mismatch for (${r.getString(0)},${r.getString(1)}): ${r.getDouble(3)} vs $expected")
    }
  }

  // ------------------------------------------------- QualityAudit + q136
  test("q136 quality audit: healthy fixture passes every constraint") {
    val rows = q("q136_quality_audit").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"constraint should pass on the fixture: $r")
      assert(r.getLong(2) == 0L, s"violations should be 0: $r")
    }
  }

  test("QualityAudit catches injected nulls, dupes, range and orphan keys exactly") {
    val fact = Seq(
      (Some(1L), Some(10L), 5.0),  // clean
      (Some(2L), Some(10L), -1.0), // range violation
      (Some(2L), Some(11L), 3.0),  // duplicate key
      (None, Some(99L), 2.0),      // null key + orphan custkey
      (Some(4L), None, 1.0)        // null custkey (FK skips nulls)
    ).map { case (k, c, v) => (k.map(Long.box).orNull, c.map(Long.box).orNull, v) }
      .toDF("k", "c", "v")
    val dim = Seq(10L, 11L).toDF("dk")
    val report = QualityAudit.run(fact, Seq(
      QualityAudit.NotNull("k"),
      QualityAudit.NotNull("c"),
      QualityAudit.Expect("v_positive", !(col("v") > 0.0)),
      QualityAudit.Unique(Seq("k")),
      QualityAudit.ForeignKey("c", dim, "dk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(report("complete_k") == ((5L, 1L, false)))
    assert(report("complete_c") == ((5L, 1L, false)))
    assert(report("v_positive") == ((5L, 1L, false)))
    // count - countDistinct: countDistinct ignores the null key, so 5 - 3 = 2
    assert(report("unique_k")._2 == 2L && !report("unique_k")._3)
    assert(report("fk_c") == ((5L, 1L, false))) // 99 orphaned; null skipped
  }

  // --------------------------------------------------------------- q137
  test("q137 PMI collocations: matches a driver-side brute force") {
    val rows = q("q137_pmi_collocations").collect().sortBy(_.getInt(6))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(6)).toSeq == (1 to rows.length))

    val bigrams = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(r => tokens(r.getString(0)).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
    val c12 = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, xs) => w -> xs.values.sum }
    val c2 = c12.groupBy(_._1._2).map { case (w, xs) => w -> xs.values.sum }
    val n = c12.values.sum.toDouble
    val expected = c12.toSeq.filter(_._2 >= 5)
      .map { case ((w1, w2), c) =>
        (w1, w2, c, math.log(c * n / (c1(w1).toDouble * c2(w2).toDouble)))
      }
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }.take(rows.length)
    rows.zip(expected).foreach { case (r, (w1, w2, c, p)) =>
      assert(r.getString(0) == w1 && r.getString(1) == w2,
        s"bigram mismatch at rank ${r.getInt(6)}: (${r.getString(0)},${r.getString(1)}) vs ($w1,$w2)")
      assert(r.getLong(2) == c, s"c12 mismatch: $r")
      assert(r.getLong(3) == c1(w1) && r.getLong(4) == c2(w2), s"marginal mismatch: $r")
      assert(math.abs(r.getDouble(5) - p) < 1e-6, s"PMI mismatch: $r vs $p")
    }
  }

  // --------------------------------------------------------------- q140
  test("q140 path trigrams: matches a driver-side brute force") {
    val rows = q("q140_path_trigrams").collect().sortBy(_.getInt(4))
    assert(rows.nonEmpty && rows.length <= 10)
    val paths = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
      .values.flatMap { evs =>
        evs.sortBy(e => (e._4, e._2)).map(_._3).sliding(3).filter(_.length == 3)
          .map(p => (p(0), p(1), p(2))) // tuple: Array equality is by reference
      }.toSeq
    val expected = paths.groupBy(identity)
      .map { case ((a, b, c), xs) => (a, b, c, xs.length.toLong) }
      .toSeq.sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(rows.length)
    rows.zip(expected).foreach { case (r, (a, b, c, n)) =>
      assert((r.getString(0), r.getString(1), r.getString(2)) == ((a, b, c)),
        s"path mismatch at rank ${r.getInt(4)}: $r vs ($a,$b,$c)")
      assert(r.getLong(3) == n, s"count mismatch: $r vs $n")
    }
  }

  // --------------------------------------------------------------- q141
  test("q141 Gini: matches a driver-side exact computation; bounded") {
    val rows = q("q141_gini_lengths").collect()
    assert(rows.nonEmpty)
    val bySrc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = bySrc(r.getString(0)).sortBy(x => (x._3, x._2)).map(_._3)
      val n = xs.length
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == xs.sum)
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val g = 2.0 * six / (n.toDouble * xs.sum) - (n + 1.0) / n
      assert(math.abs(r.getDouble(3) - g) < 1e-6, s"gini mismatch: $r vs $g")
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= 1.0, s"gini bound: $r")
    }
  }

  // --------------------------------------------------------------- q143
  test("q143 last-touch: partitions all purchases; matches a local replay") {
    val rows = q("q143_last_touch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = collection.mutable.Map[String, (Long, Double)]()
      .withDefaultValue((0L, 0.0))
    ev.groupBy(_._1).values.foreach { evs =>
      var prev: Option[(Long, String)] = None // (ms, type) of last engagement
      evs.sortBy(e => (e._4, e._2)).foreach { case (_, _, ty, ms) =>
        if (ty == "purchase") {
          val attributed = prev match {
            case Some((pms, pty)) if ms - pms <= 3600000L => (pty, (ms - pms).toDouble)
            case _ => ("none", 0.0)
          }
          val (n, s) = expected(attributed._1)
          expected(attributed._1) = (n + 1, s + attributed._2)
        }
        if (ty == "click" || ty == "view") prev = Some((ms, ty))
      }
    }
    val totalPurchases = ev.count(_._3 == "purchase").toLong
    assert(rows.values.map(_._1).sum == totalPurchases,
      "attribution must partition ALL purchases")
    expected.foreach { case (ty, (n, gapSum)) =>
      val (gotN, gotAvg) = rows(ty)
      assert(gotN == n, s"$ty count: $gotN vs $n")
      if (ty != "none")
        assert(math.abs(gotAvg.get - gapSum / n) < 0.01, s"$ty avg gap: $gotAvg")
      else assert(gotAvg.isEmpty, "none bucket must have NULL avg gap")
    }
  }

  // --------------------------------------------------------------- q138
  test("q146 blocking quality: matches a driver-side brute force over all raw pairs") {
    val r = q("q146_blocking_quality").collect() match {
      case Array(only) => only
      case other       => fail(s"expected 1 row, got ${other.length}")
    }
    val parts = graft.core.Tables(spark, sfDir).part
      .select("p_brand", "p_name").collect()
      .map(x => (x.getString(0), x.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def isMatch(a: String, b: String): Boolean =
      100.0 * (1.0 - lev(a, b).toDouble / math.max(a.length, b.length).toDouble) >= 70.0
    val memo = collection.mutable.Map.empty[(String, String), Boolean]
    var total = 0L; var cand = 0L; var truep = 0L; var cap = 0L
    for (i <- parts.indices; j <- i + 1 until parts.length) {
      total += 1
      val sameBrand = parts(i)._1 == parts(j)._1
      if (sameBrand) cand += 1
      val (na, nb) = (parts(i)._2, parts(j)._2)
      val m = na == nb ||
        memo.getOrElseUpdate(if (na < nb) (na, nb) else (nb, na), isMatch(na, nb))
      if (m) { truep += 1; if (sameBrand) cap += 1 }
    }
    assert(r.getLong(0) == parts.length.toLong)
    assert(r.getLong(1) == total)
    assert(r.getLong(2) == cand)
    assert(r.getLong(3) == truep)
    assert(r.getLong(4) == cap)
    assert(r.getDouble(5) == 1.0 - cand.toDouble / total.toDouble)
    assert(r.getDouble(6) == cap.toDouble / truep.toDouble)
  }

  test("q156 linear attribution conserves credit: shares sum to the purchase count") {
    import org.apache.spark.sql.functions._
    val rows = q("q156_linear_touch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val purchases = graft.core.Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase").count()
    // every purchase credits exactly 1.0 somewhere — including those
    // with an EMPTY 24 h frame (the coalesce-to-zero path → 'none')
    val credit = rows.map(_._3).sum
    assert(math.abs(credit - purchases.toDouble) < 1e-3,
      s"credit $credit vs purchases $purchases (${rows.mkString(", ")})")
    assert(rows.map(_._1).toSet.subsetOf(Set("click", "view", "none")))
  }

  test("q138 span coverage: matches a driver-side brute force") {
    val rows = q("q138_span_dedup").collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), tokens(r.getString(2))))
      .filter(_._3.length >= 8)
    val spans = docs.flatMap { case (id, src, tk) =>
      tk.sliding(8).map(w => (id, src, w.mkString(" ")))
    }
    val nd = spans.groupBy(_._3).map { case (s, xs) => s -> xs.map(_._1).distinct.length }
    val bySrc = spans.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getString(0)
      val xs = bySrc(src)
      assert(r.getLong(1) == xs.map(_._1).distinct.length, s"n_docs mismatch: $r")
      assert(r.getLong(2) == xs.length, s"total_spans mismatch: $r")
      val dup = xs.count(x => nd(x._3) >= 2)
      assert(r.getLong(3) == dup, s"dup_spans mismatch: $r")
      assert(math.abs(r.getDouble(4) - dup.toDouble / xs.length) < 1e-6,
        s"dup_ratio mismatch: $r")
    }
  }
}
