package graft

import org.apache.spark.sql.functions._

import graft.pipeline.DedupPipeline

class DedupPipelineSpec extends SparkSpec {

  // ids chosen so the exact-rep of the near-dup group is NOT the cluster
  // representative (7's exact-rep is 7, clustered with 2 -> kept_as 2)
  lazy val docs = {
    import spark.implicits._
    Seq(
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (5L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 2
      (7L, "the quick brown fox jumps over the lazy dog again and again todai"), // near dup of 2
      (8L, "the quick brown fox jumps over the lazy dog again and again todai"), // exact dup of 7, whose rep is near-dropped
      (9L, "completely different content about spark engines and columnar io"),
      (11L, "unrelated short text"))
      .toDF("id", "text")
  }

  test("exact dups drop in tier 1, near dups in tier 2, rest kept") {
    val r = DedupPipeline.run(spark, docs, threshold = 0.8, exact = true)
    val kept = r.keep.select("id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(2L, 9L, 11L)), kept.mkString(","))

    // 8's exact rep is 7, which tier 2 drops into 2 — kept_as must chain
    // to the FINAL kept doc, never to another dropped one
    val dropped = r.dropped.collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(dropped == Map(5L -> 2L, 7L -> 2L, 8L -> 2L), dropped.toString)

    val clusters = r.clusters.collect()
    assert(clusters.length == 1)
    assert(clusters.head.getLong(0) == 2L && clusters.head.getLong(1) == 2L)
    assert(clusters.head.getSeq[Long](2) == Seq(2L, 7L))

    val s = r.stats.head
    assert(s.getLong(s.fieldIndex("n_docs")) == 6)
    assert(s.getLong(s.fieldIndex("n_exact_dropped")) == 2)
    assert(s.getLong(s.fieldIndex("n_neardup_dropped")) == 1)
    assert(s.getLong(s.fieldIndex("n_kept")) == 3)
  }

  test("LSH tier agrees with the exact tier on this corpus") {
    val a = DedupPipeline.run(spark, docs, exact = true)
      .keep.select("id").collect().map(_.getLong(0)).sorted
    val b = DedupPipeline.run(spark, docs, exact = false)
      .keep.select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("fixture corpus: keep + dropped partitions the input exactly") {
    val d = graft.core.Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"), col("text"))
    val r = DedupPipeline.run(spark, d, exact = false)
    val total = d.count()
    val kept = r.keep.count()
    val dropped = r.dropped.count()
    assert(kept + dropped == total, s"$kept + $dropped != $total")
    // dropped ids and kept ids are disjoint and every kept_as is kept
    assert(r.dropped.join(r.keep, Seq("id")).count() == 0)
    assert(r.dropped.select(col("kept_as").as("id"))
      .distinct().join(r.keep, Seq("id"), "left_anti").count() == 0,
      "every dropped doc must point at a kept doc")
    val s = r.stats.head
    assert(s.getLong(s.fieldIndex("n_kept")) == kept)
  }
}
