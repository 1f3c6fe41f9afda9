package graft

import graft.operators.Dedup
import graft.queries.PairGraph

/** The persisted pair-graph table (PairGraph memo over
  * Dedup.buildPairIndex): serving from the table must equal the
  * scan-time PPJoin, row for row — the spec-level form of the
  * index == scan contract the driver checks on q44b/q154/q155.
  */
class PairGraphSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2))

  test("index-served pairs equal scan-time jaccardPairs on the fixture corpus") {
    val served = PairGraph.pairs(spark, sfDir, threshold = 0.8)
      .select("id_a", "id_b", "jaccard").collect().map(key).toSet
    val scan = Dedup.jaccardPairs(
      graft.core.Tables(spark, sfDir).documents
        .select(col("doc_id").as("id"), col("text")),
      threshold = 0.8)
      .select("id_a", "id_b", "jaccard").collect().map(key).toSet
    assert(served == scan)
    assert(served.nonEmpty, "fixture corpus must contain near-dups")
  }

  test("second call serves the memoized table (same rows, no divergence)") {
    val a = PairGraph.pairs(spark, sfDir, threshold = 0.8).collect().map(key).toSet
    val b = PairGraph.pairs(spark, sfDir, threshold = 0.8).collect().map(key).toSet
    assert(a == b)
  }

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/pairgraph_spec_$name"

  private def drop(t: String): Unit =
    Seq(t, s"${t}_dict", s"${t}_sets", s"${t}_postings").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("build(half) + extendPairIndex(half) equals build(all) — exact tier increments") {
    drop("pg_all"); drop("pg_inc")
    val docs = graft.core.Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"), col("text"))
    Dedup.buildPairIndex(docs, "pg_all", tmp("all"), 0.8, incremental = true)
    Dedup.buildPairIndex(docs.filter(col("id") % 2 === 0), "pg_inc", tmp("inc"),
      0.8, incremental = true)
    Dedup.extendPairIndex(spark,
      docs.filter(col("id") % 2 === 1), "pg_inc", 0.8)
    val a = spark.table("pg_all").collect().map(key).toSet
    val b = spark.table("pg_inc").collect().map(key).toSet
    assert(a == b) // jaccard DOUBLES included — cross-path values identical
    assert(a.nonEmpty)
    // the increment must find cross-half pairs, not just batch-internal
    val crossHalf = a.count { case (x, y, _) => (x + y) % 2 == 1 }
    assert(crossHalf > 0, "fixture must contain odd-even near-dup pairs")
  }

  test("a second extend folds another batch on top (three-way split)") {
    drop("pg3")
    val docs = graft.core.Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"), col("text"))
    Dedup.buildPairIndex(docs.filter(col("id") % 3 === 0), "pg3", tmp("b3"),
      0.8, incremental = true)
    Dedup.extendPairIndex(spark, docs.filter(col("id") % 3 === 1), "pg3", 0.8)
    Dedup.extendPairIndex(spark, docs.filter(col("id") % 3 === 2), "pg3", 0.8)
    val got = spark.table("pg3").collect().map(key).toSet
    val want = Dedup.jaccardPairs(docs, threshold = 0.8)
      .collect().map(key).toSet
    assert(got == want)
  }
}
