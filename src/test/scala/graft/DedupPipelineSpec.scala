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

  test("incremental: batch 2 probes batch 1's persisted index; merged keep == from-scratch") {
    import spark.implicits._
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("ndidx").toString
    // batch 1 = the shared corpus (keep = {2, 9, 11}); batch 2 arrives with
    // monotonically larger ids: a near-dup of a KEPT history doc (21), its
    // exact copy (22), a novel doc (24) and its in-batch near-dup (25)
    val batch2 = Seq(
      (21L, "the quick brown fox jumps over the lazy dog again and again todaz"),
      (22L, "the quick brown fox jumps over the lazy dog again and again todaz"),
      (24L, "unrelated fresh snippet arriving with the incremental batch case"),
      (25L, "unrelated fresh snippet arriving with the incremental batch casa"))
      .toDF("id", "text")
    try {
      val r1 = DedupPipeline.run(spark, docs, threshold = 0.8, exact = true)
      Dedup.buildNearDupIndex(r1.keep, "nd_idx", s"$tmp/idx")
      val r2 = DedupPipeline.runIncremental(spark, batch2, "nd_idx",
        batchId = 1L, threshold = 0.8, exact = true)

      // 21 must drop into history's kept 2 (via the index probe), 22 chains
      // through its exact rep 21 to the same doc, 25 drops into 24 in-batch
      val dropped2 = r2.dropped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dropped2 == Map(21L -> 2L, 22L -> 2L, 25L -> 24L), dropped2.toString)

      // merged incremental keep-list == the from-scratch run over both batches
      val merged = (r1.keep.select("id").collect() ++ r2.keep.select("id").collect())
        .map(_.getLong(0)).sorted
      val scratch = DedupPipeline.run(spark, docs.unionByName(batch2),
        threshold = 0.8, exact = true)
        .keep.select("id").collect().map(_.getLong(0)).sorted
      assert(merged.sameElements(scratch),
        s"merged=${merged.mkString(",")} scratch=${scratch.mkString(",")}")

      // the index was extended with batch 2's kept docs: a batch-3 doc
      // near-dupping 24 now finds it without re-hashing either batch
      val batch3 = Seq(
        (31L, "unrelated fresh snippet arriving with the incremental batch casx"))
        .toDF("id", "text")
      val hits = Dedup.probeNearDupIndex(spark, "nd_idx", batch3, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(hits.contains((31L, 24L)), hits.mkString(","))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nd_idx_postings")
      spark.sql("DROP TABLE IF EXISTS nd_idx_sets")
      spark.sql("DROP TABLE IF EXISTS nd_idx_batches")
    }
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
