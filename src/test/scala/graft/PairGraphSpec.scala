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
}
