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
}
