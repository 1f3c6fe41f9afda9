package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the q124-q130 link-prediction / robust-stats surface.
  * All seven are oracle-checked by the driver; these specs cover what the
  * oracle can't — agreement with an independent driver-side brute force
  * (Adamic-Adar, k-core fixpoint, HITS, TF-IDF cosine), agreement with
  * Spark's own closed-form regression aggregates (q127), and the
  * invariants of the robust statistics (entropy bounds, MAD gates).
  * sf0.001 keeps every brute force trivially collectable.
  */
class StatsGraphSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** The q113/q124 basket-pair edge list, recomputed independently. */
  private lazy val edges: Array[(Long, Long)] = {
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  private lazy val adj: Map[Long, Set[Long]] =
    (edges.map { case (u, v) => (u, v) } ++ edges.map { case (u, v) => (v, u) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  // --------------------------------------------------------------- q124
  test("q124 adamic-adar: matches a driver-side brute force on the same graph") {
    // canonicalOrder re-sorts oracle-checked output by all columns — restore rank order
    val rows = q("q124_adamic_adar").collect().sortBy(_.getInt(4))
    assert(rows.length == 20)
    assert(rows.map(_.getInt(4)).toSeq == (1 to 20))

    val edgeSet = edges.toSet
    val scores = collection.mutable.Map[(Long, Long), Double]()
    val counts = collection.mutable.Map[(Long, Long), Long]()
    for ((w, nbrs) <- adj if nbrs.size >= 2 && nbrs.size <= 50) {
      val inv = 1.0 / math.log(nbrs.size.toDouble)
      val sorted = nbrs.toArray.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        val p = (sorted(i), sorted(j))
        if (!edgeSet.contains(p)) {
          scores(p) = scores.getOrElse(p, 0.0) + inv
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      }
    }
    val expected = scores.toSeq
      .sortBy { case ((u, v), s) => (-s, u, v) }.take(20)
    rows.zip(expected).foreach { case (r, ((u, v), s)) =>
      assert(r.getLong(0) == u && r.getLong(1) == v,
        s"pair mismatch at rank ${r.getInt(4)}: got (${r.getLong(0)},${r.getLong(1)}), want ($u,$v)")
      assert(math.abs(r.getDouble(3) - s) < 1e-6, s"score mismatch: $r vs $s")
      assert(r.getLong(2) == counts((u, v)), s"common-neighbor count mismatch: $r")
    }
  }

  // --------------------------------------------------------------- q125
  test("q125 k-core: 8 bounded rounds reach the true peel fixpoint on the fixture") {
    val row = q("q125_kcore").collect().head
    val (coreNodes, coreEdges) = (row.getLong(2), row.getLong(3))

    var e = edges.toSet
    var stable = false
    while (!stable) {
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (k, vs) => k -> vs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = e.filter { case (u, v) => keep(u) && keep(v) }
      stable = next == e
      e = next
    }
    val nodes = (e.map(_._1) ++ e.map(_._2)).size
    assert(coreNodes.toInt == nodes, s"core nodes $coreNodes != fixpoint $nodes")
    assert(coreEdges.toInt == e.size, s"core edges $coreEdges != fixpoint ${e.size}")
  }

  // --------------------------------------------------------------- q126
  test("q126 HITS: matches a driver-side power iteration bit-for-bit-ish") {
    val rows = q("q126_hits_authorities").collect().sortBy(_.getInt(2))
    assert(rows.length == 10)
    assert(rows.map(_.getInt(2)).toSeq == (1 to 10))

    val e = {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    var h = e.map(_._1).distinct.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val ar = e.groupBy(_._2).map { case (p, es) => p -> es.map(x => h(x._1)).sum }
      val an = math.sqrt(ar.values.map(x => x * x).sum)
      a = ar.map { case (p, x) => p -> x / an }
      val hr = e.groupBy(_._1).map { case (c, es) => c -> es.map(x => a(x._2)).sum }
      val hn = math.sqrt(hr.values.map(x => x * x).sum)
      h = hr.map { case (c, x) => c -> x / hn }
    }
    val top = a.toSeq.sortBy { case (p, s) => (-s, p) }.take(10)
    rows.zip(top).foreach { case (r, (p, s)) =>
      assert(r.getLong(0) == p, s"authority order mismatch: $r vs ($p,$s)")
      assert(math.abs(r.getDouble(1) - s) < 1e-6, s"authority score mismatch: $r vs $s")
    }
  }

  // --------------------------------------------------------------- q127
  test("q127 sales trend: slope/intercept agree with Spark's regr_* aggregates") {
    val rows = q("q127_sales_trend").collect()
    assert(rows.nonEmpty)
    val t = graft.core.Tables(spark, sfDir)
    val rev = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        ((year(col("o_orderdate")) - 2000) * 12 + month(col("o_orderdate")) - 1)
          .cast("double").as("x"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .groupBy("n_name", "x").agg(sum(col("r")).as("y"))
    val ref = rev.groupBy("n_name")
      .agg(expr("regr_slope(y, x)").as("slope"), expr("regr_intercept(y, x)").as("b0"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (s, b) = ref(r.getString(0))
      // relative tolerance: the reference sums raw doubles (order-dependent)
      assert(math.abs(r.getDouble(2) - s) <= 1e-6 * math.max(1.0, math.abs(s)),
        s"slope: $r vs $s")
      assert(math.abs(r.getDouble(3) - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"intercept: $r vs $b")
    }
  }

  // --------------------------------------------------------------- q128
  test("q128 token entropy: within [0, ln V]; token totals tie to the corpus") {
    val rows = q("q128_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nDis) = (r.getLong(1), r.getLong(2))
      val (h, nh) = (r.getDouble(3), r.getDouble(4))
      assert(nDis in (1L, nTok), s"distinct out of range: $r")
      assert(h >= 0.0 && h <= math.log(nDis.toDouble) + 1e-9, s"entropy bound: $r")
      assert(nh >= 0.0 && nh <= 1.0 + 1e-9, s"normalized entropy bound: $r")
    }
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(filter(split(lower(trim(col("text"))), "\\s+"),
        x => length(x) > 0)).as("t")).count()
    assert(rows.map(_.getLong(1)).sum == corpus)
  }

  private implicit class InRange(x: Long) {
    def in(range: (Long, Long)): Boolean = x >= range._1 && x <= range._2
  }

  // --------------------------------------------------------------- q129
  test("q129 MAD outliers: one row per segment, medians in range, robust gate") {
    val rows = q("q129_mad_outliers").collect()
    val segs = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_mktsegment").distinct().count()
    assert(rows.length.toLong == segs, s"${rows.length} rows != $segs segments")
    val mm = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(min("o_totalprice"), max("o_totalprice")).collect().head
    rows.foreach { r =>
      assert(r.getDouble(1) >= mm.getDouble(0) && r.getDouble(1) <= mm.getDouble(1),
        s"median out of range: $r")
      assert(r.getDouble(2) >= 0.0, s"MAD must be >= 0: $r")
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(3),
        s"outliers must be a strict minority: $r")
    }
  }

  // --------------------------------------------------------------- q130
  test("q130 tf-idf cosine: top pair verified against a driver-side brute force") {
    val rows = q("q130_tfidf_cosine").collect().sortBy(_.getInt(3))
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_.getInt(3)).toSeq == (1 to rows.length))
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"pair must be ordered: $r")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0 + 1e-9,
        s"cosine out of range: $r")
    }

    // brute force in the same pruned 5-gram shingle space (df in [2, 50])
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count().toDouble
    val tok = docs.select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val tk = r.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        if (tk.length < 5) Array.empty[(Long, String)]
        else tk.sliding(5).map(w => (r.getLong(0), w.mkString(" "))).toArray
      }
      .groupBy(identity).map { case ((d, s), xs) => (d, s, xs.length.toLong) }
      .toArray
    val df = tok.groupBy(_._2).map { case (t, xs) => t -> xs.length }
      .filter { case (_, d) => d >= 2 && d <= 50 }
    val w = tok.filter(x => df.contains(x._2))
      .map { case (d, t, c) => (d, t, c.toDouble * math.log(n / df(t))) }
    val byDoc = w.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map(x => x._2 -> x._3).toMap
    }
    val norm = byDoc.map { case (d, m) =>
      d -> math.sqrt(m.values.map(x => x * x).sum)
    }
    def cos(d1: Long, d2: Long): Double = {
      val (m1, m2) = (byDoc(d1), byDoc(d2))
      val dot = m1.keysIterator.filter(m2.contains)
        .map(t => m1(t) * m2(t)).sum
      dot / (norm(d1) * norm(d2))
    }
    val top = rows.head
    assert(math.abs(top.getDouble(2) - cos(top.getLong(0), top.getLong(1))) < 1e-6,
      s"top-pair cosine mismatch: $top")
    // and no brute-force pair beats the reported top-1
    val ids = byDoc.keys.toArray.sorted
    val best = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      c = cos(ids(i), ids(j)) if c > 0.0
    } yield c).max
    assert(best <= top.getDouble(2) + 1e-6,
      s"brute-force best $best beats reported top ${top.getDouble(2)}")
  }

  // --------------------------------------------------------------- q131
  test("q131 weighted sample: winners are exactly the 200 smallest race keys") {
    val rows = q("q131_weighted_sample").collect().sortBy(_.getInt(3))
    assert(rows.length == 200)
    assert(rows.map(_.getInt(3)).toSeq == (1 to 200))

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val h = java.lang.Long.parseLong(md5hex(s"graft-w:$id").take(15), 16)
        (id, -math.log((h.toDouble + 1.0) / 1152921504606846976.0) / w.toDouble)
      }
    val expected = all.sortBy { case (id, t) => (t, id) }.take(200)
    rows.zip(expected).foreach { case (r, (id, t)) =>
      assert(r.getLong(0) == id,
        s"winner mismatch at rank ${r.getInt(3)}: got ${r.getLong(0)}, want $id")
      assert(math.abs(r.getDouble(2) - t) <= 1e-6 * math.max(1.0, t),
        s"race key mismatch: $r vs $t")
    }
  }

  // --------------------------------------------------------------- q132
  test("q132 mixture alpha: weights normalize; small sources up-weighted") {
    val rows = q("q132_mixture_alpha").collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4,
      "weights must sum to 1")
    // eff_epochs is strictly decreasing in source size (the point of alpha < 1)
    val byN = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
    byN.sliding(2).foreach { case Array(small, large) =>
      assert(small >= large, s"smaller source must get >= epochs: $small < $large")
    }
  }
}
