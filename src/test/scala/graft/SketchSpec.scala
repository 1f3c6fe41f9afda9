package graft

import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingTopK.spaceSavingTopK

class SketchSpec extends SparkSpec {

  test("space-saving with ample capacity is exact and deterministically ordered") {
    import spark.implicits._
    val data = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"item_${i % 10}"))
    val df = data.toDF("x")
    val got = df.agg(spaceSavingTopK(col("x"), 5, capacity = 100).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.est_count", "e.max_err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = truth.toSeq.sortBy { case (i, c) => (-c, i) }.take(5)
    assert(got.map(g => (g._1, g._2)).toSeq == expect)
    assert(got.forall(_._3 == 0L), "exact regime must report zero error")
  }

  test("space-saving under pressure: bounds hold, heavy hitter survives") {
    import spark.implicits._
    // one dominant item + a long tail wider than capacity
    val data = Seq.fill(500)("heavy") ++ (1 to 400).map(i => s"tail_$i")
    val df = data.toDF("x").repartition(8)
    val got = df.agg(spaceSavingTopK(col("x"), 3, capacity = 16).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.est_count", "e.max_err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val heavy = got.find(_._1 == "heavy")
    assert(heavy.isDefined, s"heavy hitter must survive sketching: ${got.toSeq}")
    val (_, est, err) = heavy.get
    assert(est >= 500 && est - err <= 500, s"bounds: est=$est err=$err true=500")
  }

  test("sketch merges across many partitions agree with single partition") {
    import spark.implicits._
    val data = (1 to 2000).map(i => s"w${i % 50}")
    def run(parts: Int) =
      data.toDF("x").repartition(parts)
        .agg(spaceSavingTopK(col("x"), 10, capacity = 200).as("t"))
        .select(explode(col("t")).as("e")).select("e.item", "e.est_count")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run(1) == run(16), "exact regime must be partitioning-invariant")
  }

  test("count-min: est >= true, bounded overcount, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import graft.functions.CountMinEstimate.countMinEstimate
    val toks = graft.core.Tables(spark, sfDir).documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .localCheckpoint()
    val n = toks.count()
    val truth = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // watch frequent, rare, and ABSENT items
    val watch = truth.toSeq.sortBy(-_._2).take(3).map(_._1) ++
      truth.toSeq.sortBy(_._2).take(2).map(_._1) ++ Seq("never_seen_token")
    val width = 1 << 10
    def run(parts: Int) = toks.repartition(parts)
      .agg(countMinEstimate(col("tok"), watch, depth = 5, width = width).as("t"))
      .select(explode(col("t")).as("e")).select("e.item", "e.est_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val est = run(16).toMap
    for ((item, e) <- est) {
      val t = truth.getOrElse(item, 0L)
      assert(e >= t, s"$item: est $e < true $t")
      // the ε = e/width bound at δ = e^-5; deterministic hashes make this
      // a fixed (not probabilistic) property of this corpus + seed set
      assert(e - t <= (math.E * n / width).toLong + 1, s"$item overcount ${e - t}")
    }
    // element-wise-add merge is exact → layout cannot matter
    assert(run(1) == run(16))
  }

  // ------------------------------------------------------------------
  // KLL quantile sketch

  /** Max |rank(estimate) − q·n| / n over the requested quantiles. */
  private def maxRankErr(sorted: Array[Double], qs: Seq[Double],
      est: Map[Double, Double]): Double =
    qs.map { q =>
      val v = est(q)
      // any rank within the value's tie range is a correct answer
      val lo = sorted.count(_ < v)
      val hi = sorted.count(_ <= v)
      val target = math.max(1L, math.ceil(q * sorted.length).toLong).toDouble
      val d = if (target < lo + 1) (lo + 1) - target
              else if (target > hi) target - hi
              else 0.0
      d / sorted.length
    }.max

  private def collectQuantiles(df: org.apache.spark.sql.DataFrame): Map[Double, Double] =
    df.select(explode(col("t")).as("e")).select("e.q", "e.value")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap

  test("kll: exact order statistics while nothing has compacted (n < k)") {
    import spark.implicits._
    import graft.functions.Kll.kllQuantiles
    val data = (1 to 100).map(_.toDouble)
    val est = collectQuantiles(
      scala.util.Random.shuffle(data).toDF("x").repartition(4)
        .agg(kllQuantiles(col("x"), Seq(0.0, 0.25, 0.5, 0.9, 1.0), k = 256).as("t")))
    assert(est(0.0) == 1.0 && est(1.0) == 100.0)
    assert(est(0.25) == 25.0 && est(0.5) == 50.0 && est(0.9) == 90.0)

    // non-Double numeric children must coerce, not crash mid-job
    // (Decimal's runtime class is not java.lang.Double)
    val estDec = collectQuantiles(
      data.toDF("x").select(col("x").cast("decimal(10,2)").as("x"))
        .agg(kllQuantiles(col("x"), Seq(0.5), k = 256).as("t")))
    assert(estDec(0.5) == 50.0)
    val estInt = collectQuantiles(
      (1 to 100).toDF("x").agg(kllQuantiles(col("x"), Seq(1.0), k = 256).as("t")))
    assert(estInt(1.0) == 100.0)
  }

  test("kll: rank error bounded under heavy compaction and any partitioning") {
    import graft.functions.Kll.kllQuantiles
    val values = graft.core.Tables(spark, sfDir).events
      .select(col("value")).localCheckpoint()
    val sorted = values.collect().map(_.getDouble(0)).sorted
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    for (parts <- Seq(1, 16); k <- Seq(64, 256)) {
      val est = collectQuantiles(values.repartition(parts)
        .agg(kllQuantiles(col("value"), qs, k).as("t")))
      val err = maxRankErr(sorted, qs, est)
      // uniform-capacity compactor: generous 4·log₂(n/k)/k envelope
      val bound = math.max(0.01, 4.0 * (math.log(sorted.length.toDouble / k)
        / math.log(2.0)) / k)
      assert(err <= bound, s"k=$k parts=$parts rank err $err > $bound")
    }
  }

  test("kll sketch table: persist per-source sketches, merge without rescanning") {
    import graft.functions.Kll.{kllBuild, kllMergeQuantiles}
    val docs = graft.core.Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars").cast("double").as("v"))
    // ingest-time artifact: one kilobyte-ish sketch row per source
    val tmp = java.nio.file.Files.createTempDirectory("graft-kll").toString
    docs.groupBy("source").agg(kllBuild(col("v"), k = 128).as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    assert(stored.count() > 1, "need multiple sketch rows to make merging real")
    // query time: corpus-wide quantiles from the stored rows alone
    val qs = Seq(0.1, 0.5, 0.9)
    val est = collectQuantiles(
      stored.agg(kllMergeQuantiles(col("sk"), qs, k = 128).as("t")))
    val sorted = docs.collect().map(_.getDouble(1)).sorted
    val err = maxRankErr(sorted, qs, est)
    assert(err <= 0.05, s"merged-sketch rank err $err")
    // capacity mismatch must fail loudly, not skew silently
    val e = intercept[Exception] {
      stored.agg(kllMergeQuantiles(col("sk"), qs, k = 256).as("t")).collect()
    }
    assert(e.getMessage.contains("k=128") || e.getCause.getMessage.contains("k=128"))
  }

  test("count-min inner product: join-size estimate bounded, from stored sketches") {
    import spark.implicits._
    import graft.functions.CountMin.{cmInnerProduct, countMinBuild}
    // skewed fact keys vs a dim with duplicated hot rows — the shape
    // where a pre-flight size estimate actually changes the plan
    val fact = (1 to 5000).map(i => if (i % 10 != 0) "hot" else s"k$i").toDF("k")
    val dim = (Seq.fill(20)("hot") ++ (1 to 500).map(i => s"k$i")).toDF("k")
    val trueSize = fact.join(dim, "k").count()
    val width = 1 << 10
    // the production path: persist per-table sketch rows, estimate later
    val tmp = java.nio.file.Files.createTempDirectory("cmip").toString
    fact.agg(countMinBuild(col("k"), width = width).as("sk"))
      .withColumn("side", lit("fact"))
      .unionByName(dim.agg(countMinBuild(col("k"), width = width).as("sk"))
        .withColumn("side", lit("dim")))
      .write.mode("overwrite").parquet(tmp)
    val sk = spark.read.parquet(tmp)
    val est = sk.filter(col("side") === "fact").select(col("sk").as("a"))
      .crossJoin(sk.filter(col("side") === "dim").select(col("sk").as("b")))
      .select(cmInnerProduct(col("a"), col("b")).as("est"))
      .head.getLong(0)
    assert(est >= trueSize, s"CM inner product must not undercount: $est < $trueSize")
    val slack = (math.E * fact.count() * dim.count() / width).toLong + 1
    assert(est <= trueSize + slack, s"overcount ${est - trueSize} > eps bound $slack")
  }

  // ------------------------------------------------------------------
  // incremental metrics rollup

  test("stats rollup: merge of batch rollups == from-scratch, through parquet") {
    import graft.operators.StatsRollup
    val ev = graft.core.Tables(spark, sfDir).events
      .select(col("event_type"), col("value"), col("user_id"))
      .localCheckpoint()
    // slice the "history" into three ingest batches by an arbitrary rule
    val batches = Seq(
      ev.filter(col("user_id") % 3 === 0),
      ev.filter(col("user_id") % 3 === 1),
      ev.filter(col("user_id") % 3 === 2))
    val tmp = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    // ingest loop: each batch's rollup merges with the stored table
    batches.zipWithIndex.foreach { case (b, i) =>
      val r = StatsRollup.build(b, col("event_type"), col("value"), col("user_id"))
      val merged =
        if (i == 0) r
        else StatsRollup.merge(r.unionByName(spark.read.parquet(s"$tmp/r${i - 1}")))
      merged.write.mode("overwrite").parquet(s"$tmp/r$i")
    }
    val incremental = spark.read.parquet(s"$tmp/r${batches.size - 1}")
    val scratch = StatsRollup.build(ev, col("event_type"), col("value"), col("user_id"))

    def reportMap(r: org.apache.spark.sql.DataFrame) =
      StatsRollup.report(r, Seq(0.5)).collect().map { row =>
        row.getString(0) -> (row.getLong(1), row.getDouble(2), row.getLong(4).toDouble,
          row.getSeq[org.apache.spark.sql.Row](5).head.getDouble(1))
      }.toMap
    val (inc, scr) = (reportMap(incremental), reportMap(scratch))
    assert(inc.keySet == scr.keySet)
    val truth = ev.groupBy("event_type")
      .agg(count(lit(1)), countDistinct(col("user_id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, (n, s, dEst, med)) <- inc) {
      val (nScr, sScr, dScr, medScr) = scr(k)
      assert(n == nScr && n == truth(k)._1, s"$k exact count must survive slicing")
      assert(math.abs(s - sScr) < 1e-6, s"$k decimal sum must survive slicing")
      // HLL estimate: within 5% of the true distinct count on both paths
      Seq(dEst, dScr).foreach { d =>
        assert(math.abs(d - truth(k)._2) <= 0.05 * truth(k)._2, s"$k hll $d vs ${truth(k)._2}")
      }
      // medians from both paths: sane values inside the data range
      Seq(med, medScr).foreach(m => assert(m > 0 && m < 500, s"$k median $m"))
    }
    // corpus-wide answer from stored rows alone
    val g = StatsRollup.globalReport(incremental, Seq(0.5)).collect()
    assert(g.length == 1 && g.head.getLong(1) == ev.count())
  }
}
