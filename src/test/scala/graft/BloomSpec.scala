package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** BloomPrune: the pruned join must be RESULT-identical to the plain
  * join (false positives die at the join), the pruned probe must be a
  * superset of the exact semi-join but far smaller than the full probe,
  * and the bloom test must sit on the probe side BELOW the join even
  * when the join is a shuffle (broadcast disabled) — the configuration
  * the operator exists for.
  */
class BloomSpec extends SparkSpec {

  private def t = graft.core.Tables(spark, sfDir)

  test("prunedJoin == plain join under a forced shuffle join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = t.part.filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"), col("p_size"))
      val fact = t.lineitem.select(col("l_partkey"), col("l_extendedprice"))
      val pruned = BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
      val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      assert(pruned.count() == plain.count())
      assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
      // the bloom test runs below the join: physical plan carries
      // might_contain on the probe side and no broadcast anywhere
      val phys = pruned.queryExecution.executedPlan.toString
      assert(phys.contains("might_contain"), phys.take(2000))
      assert(!phys.contains("BroadcastHashJoin"), phys.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("prune: superset of the exact semi-join, far smaller than the probe") {
    val dim = t.part.filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val fact = t.lineitem.select(col("l_partkey"))
    val full = fact.count()
    val exact = fact.join(dim, col("l_partkey") === col("p_partkey"), "left_semi").count()
    val pruned = BloomPrune.prune(fact, col("l_partkey"), dim, col("p_partkey")).count()
    assert(pruned >= exact, s"bloom has no false negatives: $pruned >= $exact")
    // 1% fpp on a 1/25-selective dim: pruned stays within a few percent
    // of exact, nowhere near the full scan
    assert(pruned <= exact + (full * 0.05).toLong + 1, s"pruned=$pruned exact=$exact full=$full")
  }

  test("empty build side short-circuits to an empty, same-schema probe") {
    val dim = t.part.filter(lit(false)).select(col("p_partkey"))
    val fact = t.lineitem.select(col("l_partkey"), col("l_quantity"))
    val pruned = BloomPrune.prune(fact, col("l_partkey"), dim, col("p_partkey"))
    assert(pruned.count() == 0L)
    assert(pruned.schema == fact.schema)
  }

  test("string keys hash consistently between build and probe") {
    import spark.implicits._
    val build = Seq("alpha", "beta", "gamma").toDF("k")
    val probe = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta").toDF("k")
    val kept = BloomPrune.prune(probe, col("k"), build, col("k"))
      .as[String].collect().toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(kept), kept.toString)
  }
}
