package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the q113-q116 graph/embedding surface. All four are
  * oracle-checked by the driver; these specs cover what the oracle can't —
  * agreement with an independent brute force (triangles, diversity),
  * invariants of the model scores, determinism of the split, and the plan
  * shapes (broadcast centroids, no cartesian in the wedge join).
  */
class GraphMlSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // --------------------------------------------------------------- q113
  test("q113 triangle count: degree-oriented census matches the naive wedge count") {
    val row = q("q113_triangle_count").collect().head
    val (nNodes, nEdges, nTri) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nNodes > 0 && nEdges > 0)
    assert(nEdges <= nNodes.toLong * (nNodes - 1) / 2)

    // independent naive count (u<v edges, no orientation) on the same graph
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    val ed = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v")).distinct()
    ed.createOrReplaceTempView("tri_ed")
    val naive = spark.sql("""
      SELECT COUNT(*) AS n FROM tri_ed e1
      JOIN tri_ed e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN tri_ed e3 ON e3.u = e1.v AND e3.v = e2.v""").collect().head.getLong(0)
    assert(nTri == naive, s"oriented $nTri != naive $naive")
    // the scale shape: adjacency arrays broadcast (measured gate), and no
    // cartesian anywhere — every hop is an equi-join or an in-row intersect
    val plan = q("q113_triangle_count").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastExchange"), "adjacency must broadcast under the gate")
    assert(!plan.contains("CartesianProduct"), "no cartesian in the census")
  }

  // --------------------------------------------------------------- q114
  test("q114 bigram logprob: finite, non-positive, covers every multi-token doc") {
    val rows = q("q114_bigram_logprob").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, s"n_bigrams must be >= 1: $r")
      val lp = r.getDouble(2)
      assert(!lp.isNaN && !lp.isInfinite && lp <= 0.0,
        s"avg ln P must be finite and <= 0: $r")
    }
    // every document with >= 2 whitespace tokens scores; no others do
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(filter(split(lower(trim(col("text"))), "\\s+"),
          x => length(x) > 0)).as("n"))
      .filter(col("n") >= 2).count()
    assert(rows.length.toLong == expected)
  }

  // --------------------------------------------------------------- q115
  test("q115 centroid classify: partitions the test split; centroids broadcast") {
    val rows = q("q115_centroid_classify").collect()
    val total = rows.map(_.getLong(2)).sum
    // confusion-matrix cells sum to exactly the 20%-bucket test rows
    val testN = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("bkt",
        graft.operators.Sampling.hashBucket(col("vec_id"), "graft-split"))
      .filter(col("bkt") >= 80).count()
    assert(total == testN, s"confusion total $total != test rows $testN")
    // labels on both axes come from the label domain
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0).toLong).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getLong(0)) && labels.contains(r.getLong(1)))
    }
    // the scale shape: centroid table reaches the scorer as a broadcast,
    // and the plan contains no cartesian over data-sized frames
    val plan = q("q115_centroid_classify").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "centroids must broadcast")
  }

  // --------------------------------------------------------------- q118
  test("q118 LPA: deterministic communities; disjoint nodes; density-respecting") {
    val rows = q("q118_lpa_communities").collect()
    assert(rows.nonEmpty, "strong graph must yield at least one community")
    rows.foreach(r => assert(r.getLong(1) >= 2))
    // rerun → identical (synchronous rounds + min-label ties are pure)
    assert(q("q118_lpa_communities").collect().toSeq == rows.toSeq)
    // communities partition a subset of nodes: sizes sum to <= node count
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    val nodes = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(explode(array(col("u"), col("v"))).as("id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum <= nodes)
  }

  // --------------------------------------------------------------- q119
  test("q119 clustering coefficient: in [0,1]; per-node counts match brute force") {
    val rows = q("q119_clustering_coeff").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (d, tri, coeff) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(coeff >= 0.0 && coeff <= 1.0, s"coeff out of range: $r")
      assert(tri <= d * (d - 1) / 2, s"more triangles than wedges: $r")
    }
    // brute-force per-node triangle membership for the reported nodes
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v")).distinct()
      .createOrReplaceTempView("cc_ed")
    val perNode = spark.sql("""
      SELECT id, COUNT(*) AS tri FROM (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z FROM cc_ed e1
        JOIN cc_ed e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN cc_ed e3 ON e3.u = e1.v AND e3.v = e2.v)
      LATERAL VIEW explode(array(x, y, z)) t AS id GROUP BY id""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(perNode.getOrElse(r.getLong(0), 0L) == r.getLong(2),
        s"per-node triangle mismatch for part ${r.getLong(0)}")
    }
  }

  // --------------------------------------------------------------- q120
  test("q120 Zipf fit: negative slope; matches a local double-precision fit") {
    val row = q("q120_zipf_fit").collect().head
    val (nd, slope, intercept, share) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(nd > 0 && share > 0.0 && share <= 1.0)
    assert(slope < 0.0, s"token frequencies must decay with rank: $slope")
    // independent local fit (plain double sums — tolerance, not equality)
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(org.apache.spark.sql.functions.filter(
        split(lower(trim(col("text"))), "\\s+"), x => length(x) > 0)).as("t"))
      .groupBy("t").count().collect().map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(1000).zipWithIndex
    val xs = top.map { case (_, i) => math.log(i + 1.0) }
    val ys = top.map { case ((_, c), _) => math.log(c.toDouble) }
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val lSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - lSlope) < 1e-6, s"$slope vs local $lSlope")
    assert(math.abs(intercept - (sy - lSlope * sx) / n) < 1e-6)
  }

  // --------------------------------------------------------------- q122
  test("q122 assortativity: in [-1,1]; matches the local Newman formula") {
    val row = q("q122_degree_assortativity").collect().head
    val (m, r) = (row.getLong(0), row.getDouble(1))
    assert(m > 0 && r >= -1.0 && r <= 1.0)
    // local recomputation from collected edges
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v")).distinct()
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    val d = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(m == edges.length.toLong)
    val (sjk, sj, ssq) = edges.foldLeft((0L, 0L, 0L)) { case ((a, b, c), (u, v)) =>
      (a + d(u) * d(v), b + d(u) + d(v), c + d(u) * d(u) + d(v) * d(v))
    }
    val mD = m.toDouble
    val half = sj.toDouble / (2.0 * mD)
    val local = (sjk.toDouble / mD - half * half) / (ssq.toDouble / (2.0 * mD) - half * half)
    assert(math.abs(r - local) < 1e-6, s"$r vs local $local")
  }

  // --------------------------------------------------------------- q123
  test("q123 PCA: unit-norm loadings; matches a local power iteration") {
    val rows = q("q123_pca_power").collect().sortBy(_.getLong(0))
    assert(rows.length == 64)
    val loadings = rows.map(_.getDouble(1))
    val eig = rows.head.getDouble(2)
    assert(eig > 0.0)
    assert(math.abs(loadings.map(x => x * x).sum - 1.0) < 1e-3, "v must be unit norm")
    // local dense power iteration: same centering, same 3 iterations
    val x = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = x.length
    val dims = x.head.length
    val mu = Array.tabulate(dims)(j => x.map(_(j)).sum / n)
    val xcM = x.map(row => Array.tabulate(dims)(j => row(j) - mu(j)))
    var v = Array.fill(dims)(0.125)
    var nrm = 0.0
    for (_ <- 1 to 3) {
      val s = xcM.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val w = Array.tabulate(dims)(j => xcM.zip(s).map { case (row, si) => row(j) * si }.sum)
      nrm = math.sqrt(w.map(t => t * t).sum)
      v = w.map(_ / nrm)
    }
    rows.zip(v).foreach { case (r0, lv) =>
      assert(math.abs(r0.getDouble(1) - lv) < 1e-4,
        s"dim ${r0.getLong(0)}: ${r0.getDouble(1)} vs local $lv")
    }
    assert(math.abs(eig - nrm / n) < 1e-4, s"$eig vs local ${nrm / n}")
  }

  // --------------------------------------------------------------- q116
  test("q116 shard diversity: matches the O(n^2) pairwise mean on one label") {
    val rows = q("q116_shard_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0, s"diversity >= 0: $r"))

    // brute-force E||x-y||^2 over independent draws (including x=y pairs,
    // which the identity's population form counts) for label 0
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("label") === 0)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    var acc = 0.0
    for (a <- vecs; b <- vecs) {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      acc += s
    }
    val brute = acc / (n.toLong * n)
    val got = rows.find(_.getLong(0) == 0L).get.getDouble(2)
    assert(math.abs(got - brute) < 1e-4, s"identity $got vs brute $brute")
  }

  // --------------------------------------------------------------- q139
  test("q139 BFS hops: matches a driver-side BFS from the same seeds") {
    val rows = q("q139_bfs_hops").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)

    // independent BFS over the collected basket graph
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey"), col("b.l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, vs) =>
      k -> (edges ++ edges.map(_.swap)).count(_._1 == k).toLong
    }
    val seeds = deg.toSeq.sortBy { case (id, d) => (-d, id) }.take(5).map(_._1)
    seeds.foreach { seed =>
      var dist = Map(seed -> 0)
      var frontier = Set(seed)
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> h)
        frontier = next
      }
      val hist = dist.groupBy(_._2).map { case (h, xs) => h -> xs.size.toLong }
      hist.foreach { case (h, n) =>
        assert(rows((seed, h)) == n, s"seed $seed hop $h: ${rows.get((seed, h))} vs $n")
      }
      assert(rows.keys.count(_._1 == seed) == hist.size,
        s"seed $seed: extra hop rows in query output")
    }
    assert(rows.keys.map(_._1).toSet == seeds.toSet, "seed set mismatch")
  }

  // --------------------------------------------------------------- q142
  test("q142 hash walks: deterministic argmin-digest walks match a local replay") {
    val rows = q("q142_hash_walks").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    val starts = rows.keys.filter(_._2 == 0).map(_._1).toSet
    assert(starts.size == 20)
    starts.foreach(s => assert(rows((s, 0)) == s, "step 0 must be the start node"))

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey").distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey"), col("b.l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    starts.foreach { start =>
      var cur = start
      for (k <- 1 to 3) {
        val next = adj(cur).map(t => (md5hex(s"$start:$k:$cur:$t"), t)).min._2
        assert(rows((start, k)) == next,
          s"walk $start step $k: got ${rows((start, k))}, want $next")
        cur = next
      }
    }
  }
}
