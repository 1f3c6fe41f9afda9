package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.RetrievalIndex
import graft.queries.CurationOps

/** The persisted inverted index serves the scan-time retrieval
  * contracts exactly: index-built topK/boolean equal q88/q87 run
  * directly against the corpus, increments equal from-scratch builds,
  * and the term probe actually bucket-prunes the postings scan.
  */
class RetrievalIndexSpec extends SparkSpec {

  private def docs = Tables(spark, sfDir).documents

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"rix_$tag").toString

  private def drop(table: String): Unit =
    Seq("postings", "meta").foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${table}_$s"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("index topK equals q88 run directly against the corpus") {
    drop("rix_full")
    RetrievalIndex.build(docs, "rix_full", freshPath("full"))
    val fromIndex = RetrievalIndex.topK(spark, "rix_full", CurationOps.rankQueries)
    val direct = CurationOps.all.find(_.name == "q88_keyword_topk").get.run(spark, sfDir)
    assert(asSet(fromIndex) == asSet(direct))
  }

  test("index boolean equals q87 run directly against the corpus") {
    drop("rix_b")
    RetrievalIndex.build(docs, "rix_b", freshPath("b"))
    val fromIndex = RetrievalIndex.boolean(spark, "rix_b", CurationOps.boolQueries)
    val direct = CurationOps.all.find(_.name == "q87_boolean_search").get.run(spark, sfDir)
    assert(asSet(fromIndex) == asSet(direct))
  }

  test("build(half) + extend(half) equals build(all) — increments cost a batch, not history") {
    drop("rix_all"); drop("rix_inc")
    RetrievalIndex.build(docs, "rix_all", freshPath("all"))
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), "rix_inc", freshPath("inc"))
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), "rix_inc", batchId = 1L)
    val a = RetrievalIndex.topK(spark, "rix_all", CurationOps.rankQueries)
    val b = RetrievalIndex.topK(spark, "rix_inc", CurationOps.rankQueries)
    assert(asSet(a) == asSet(b))
    // meta N must see both batches
    val n = spark.table("rix_inc_meta").agg(sum("n_docs")).head.getLong(0)
    assert(n == docs.count())
  }

  test("replay of a COMMITTED extend is a no-op — postings, meta, and results untouched") {
    drop("rix_rc")
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), "rix_rc", freshPath("rc"))
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), "rix_rc", batchId = 1L)
    val rows = spark.table("rix_rc_postings").count()
    val before = RetrievalIndex.topK(spark, "rix_rc", CurationOps.rankQueries)
    val snapshot = asSet(before)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), "rix_rc", batchId = 1L)
    assert(spark.table("rix_rc_postings").count() == rows)
    assert(spark.table("rix_rc_meta").count() == 2) // build row + one batch row
    assert(asSet(RetrievalIndex.topK(spark, "rix_rc", CurationOps.rankQueries)) == snapshot)
  }

  test("replay of a CRASHED extend collapses: serve == from-scratch, N exact") {
    drop("rix_cr"); drop("rix_cr_full")
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    RetrievalIndex.build(evens, "rix_cr", freshPath("cr"))
    // the crash: data append lands, the trailing meta commit does not
    RetrievalIndex.applyExtend(odds, "rix_cr", batchId = 1L)
    // replay: marker absent → the batch re-folds end to end and commits
    RetrievalIndex.extend(odds, "rix_cr", batchId = 1L)
    // every batch-1 posting row is in the table TWICE …
    val batch1 = spark.table("rix_cr_postings").filter(col("batch_id") === 1L)
    assert(batch1.count() == 2 * batch1.dropDuplicates("term", "doc_id").count())
    // … and the serve paths recover the exact from-scratch answers
    RetrievalIndex.build(docs, "rix_cr_full", freshPath("crf"))
    assert(asSet(RetrievalIndex.topK(spark, "rix_cr", CurationOps.rankQueries)) ==
      asSet(RetrievalIndex.topK(spark, "rix_cr_full", CurationOps.rankQueries)))
    assert(asSet(RetrievalIndex.boolean(spark, "rix_cr", CurationOps.boolQueries)) ==
      asSet(RetrievalIndex.boolean(spark, "rix_cr_full", CurationOps.boolQueries)))
    // meta: one row per committed batch — N never double-counts
    val n = spark.table("rix_cr_meta").agg(sum("n_docs")).head.getLong(0)
    assert(n == docs.count())
  }

  test("the term probe bucket-prunes the postings scan") {
    drop("rix_p")
    RetrievalIndex.build(docs, "rix_p", freshPath("p"), nBuckets = 16)
    // topK pins the matched probe (localCheckpoint), so the scan lives in
    // the checkpoint job's plan — assert pruning on the probe shape
    // itself, on the same bucket-pruning clone the operator plans on
    val plan = RetrievalIndex.probeSession(spark, "rix_p_postings")
      .table("rix_p_postings").filter(col("term").isin("spark"))
      .queryExecution.executedPlan.toString
    // a single-term probe must select a strict subset of the 16 buckets
    val m = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan.take(2000))
    assert(m.get.group(1).toInt < 16, plan.take(2000))
  }

  test("phrase search: anchors, overlaps, duplicated terms, and absences are exact") {
    import spark.implicits._
    Seq("rix_ph_positions", "rix_ph_pbatches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val corpus = Seq(
      (1L, "alpha beta gamma"),        // "alpha beta" once
      (2L, "alpha alpha alpha beta"),  // "alpha alpha" OVERLAPS: 2 anchors
      (3L, "beta alpha"),              // terms present, adjacency reversed
      (4L, "alpha"),                   // too short for any phrase
      (5L, "x alpha beta alpha beta")) // "alpha beta" twice
      .toDF("doc_id", "text")
    RetrievalIndex.buildPositions(corpus, "rix_ph", freshPath("ph"))
    val got = RetrievalIndex.phrase(spark, "rix_ph", Seq(
        1 -> Seq("alpha", "beta"),
        2 -> Seq("alpha", "alpha"),    // duplicated phrase term
        3 -> Seq("beta", "gamma")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1, 1L, 1L), (1, 2L, 1L), (1, 5L, 2L), // adjacency, not co-occurrence (doc 3 absent)
      (2, 2L, 2L),                           // overlapping anchors both count
      (3, 1L, 1L)))
    spark.sql("DROP TABLE IF EXISTS rix_ph_positions")
  }

  test("deleteDocs: tombstones + negative meta row = from-scratch index of the survivors") {
    drop("rix_dl"); drop("rix_dlf")
    Seq("rix_dl_deleted").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val dlPath = freshPath("dl")
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), "rix_dl", dlPath)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), "rix_dl", batchId = 1L)
    val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    // crashed delete (tombstones land, meta row doesn't) + full replay
    RetrievalIndex.applyDeleteDocs(spark, victims, "rix_dl", dlPath, batchId = 2L)
    RetrievalIndex.deleteDocs(spark, victims, "rix_dl", dlPath, batchId = 2L)
    // N is exact despite the crash: meta sums to the surviving count
    val n = spark.table("rix_dl_meta").dropDuplicates("n_docs", "batch_id")
      .agg(sum("n_docs")).head.getLong(0)
    assert(n == docs.filter(col("doc_id") % 7 =!= 3).count())
    // ranking equals a from-scratch index of the surviving corpus —
    // the idf shift included
    RetrievalIndex.build(docs.filter(col("doc_id") % 7 =!= 3), "rix_dlf", freshPath("dlf"))
    assert(asSet(RetrievalIndex.topK(spark, "rix_dl", CurationOps.rankQueries)) ==
      asSet(RetrievalIndex.topK(spark, "rix_dlf", CurationOps.rankQueries)))
    assert(asSet(RetrievalIndex.boolean(spark, "rix_dl", CurationOps.boolQueries)) ==
      asSet(RetrievalIndex.boolean(spark, "rix_dlf", CurationOps.boolQueries)))
    // committed replay of the delete is a no-op (N untouched)
    RetrievalIndex.deleteDocs(spark, victims, "rix_dl", dlPath, batchId = 2L)
    assert(spark.table("rix_dl_meta").dropDuplicates("n_docs", "batch_id")
      .agg(sum("n_docs")).head.getLong(0) == n)
    // double-delete in a LATER batch subtracts nothing (fresh filter)
    RetrievalIndex.deleteDocs(spark, victims, "rix_dl", dlPath, batchId = 3L)
    assert(spark.table("rix_dl_meta").dropDuplicates("n_docs", "batch_id")
      .agg(sum("n_docs")).head.getLong(0) == n)
    spark.sql("DROP TABLE IF EXISTS rix_dl_deleted")
  }

  test("compact: replay dups and tombstones leave physically; N folds to one exact row") {
    drop("rix_cp"); drop("rix_cpf")
    spark.sql("DROP TABLE IF EXISTS rix_cp_deleted")
    val cpPath = freshPath("cp")
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), "rix_cp", cpPath)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    RetrievalIndex.applyExtend(odds, "rix_cp", batchId = 1L)
    RetrievalIndex.extend(odds, "rix_cp", batchId = 1L) // crash + replay
    val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    RetrievalIndex.deleteDocs(spark, victims, "rix_cp", cpPath, batchId = 2L)
    RetrievalIndex.compact(spark, "rix_cp", cpPath)
    // physical state: one batch, no deleted doc, no duplicates, 1-row meta
    val post = spark.table("rix_cp_postings")
    assert(post.filter(col("batch_id") =!= 0L).isEmpty)
    assert(post.count() == post.dropDuplicates("term", "doc_id").count())
    val delSet = victims.collect().map(_.getLong(0)).toSet
    assert(post.filter(col("doc_id").isin(delSet.toSeq: _*)).isEmpty)
    assert(spark.table("rix_cp_deleted").isEmpty)
    val meta = spark.table("rix_cp_meta").collect()
    assert(meta.length == 1 && meta.head.getLong(1) == 0L)
    assert(meta.head.getLong(0) == docs.filter(col("doc_id") % 7 =!= 3).count())
    // serve equality vs a from-scratch index of the survivors
    RetrievalIndex.build(docs.filter(col("doc_id") % 7 =!= 3), "rix_cpf", freshPath("cpf"))
    assert(asSet(RetrievalIndex.topK(spark, "rix_cp", CurationOps.rankQueries)) ==
      asSet(RetrievalIndex.topK(spark, "rix_cpf", CurationOps.rankQueries)))
    spark.sql("DROP TABLE IF EXISTS rix_cp_deleted")
  }

  test("positions: crashed+replayed extend serves the exact from-scratch phrase results") {
    Seq("rix_pi_positions", "rix_pi_pbatches", "rix_pf_positions", "rix_pf_pbatches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    RetrievalIndex.buildPositions(evens, "rix_pi", freshPath("pi"))
    // crash: positions land, the marker doesn't — then the full replay
    RetrievalIndex.applyExtendPositions(odds, "rix_pi", batchId = 1L)
    RetrievalIndex.extendPositions(odds, "rix_pi", batchId = 1L)
    val dup = spark.table("rix_pi_positions").filter(col("batch_id") === 1L)
    assert(dup.count() == 2 * dup.dropDuplicates("term", "doc_id").count())
    RetrievalIndex.buildPositions(docs, "rix_pf", freshPath("pf"))
    val phrases = graft.queries.CurationOps.phraseQueries
    assert(asSet(RetrievalIndex.phrase(spark, "rix_pi", phrases)) ==
      asSet(RetrievalIndex.phrase(spark, "rix_pf", phrases)))
    // committed replay: a second extend is a no-op
    val rows = spark.table("rix_pi_positions").count()
    RetrievalIndex.extendPositions(odds, "rix_pi", batchId = 1L)
    assert(spark.table("rix_pi_positions").count() == rows)
  }

  test("the writer fence rejects an out-of-sequence stamp loudly, on both tiers") {
    drop("rix_fn")
    Seq("rix_fn_deleted", "rix_fnp_positions", "rix_fnp_pbatches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val p = freshPath("fn")
    RetrievalIndex.build(evens, "rix_fn", p)
    // a second writer racing ahead with a FRESH stamp fails loudly…
    val e = intercept[IllegalArgumentException] {
      RetrievalIndex.extend(odds, "rix_fn", batchId = 5L)
    }
    assert(e.getMessage.contains("out of sequence"))
    // …while the in-sequence batch passes, including its crashed replay
    RetrievalIndex.applyExtend(odds, "rix_fn", batchId = 1L)
    RetrievalIndex.extend(odds, "rix_fn", batchId = 1L)
    // deletes share the ledger: same fence, same sequence
    val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val e2 = intercept[IllegalArgumentException] {
      RetrievalIndex.deleteDocs(spark, victims, "rix_fn", p, batchId = 9L)
    }
    assert(e2.getMessage.contains("out of sequence"))
    RetrievalIndex.deleteDocs(spark, victims, "rix_fn", p, batchId = 2L)
    assert(RetrievalIndex.topK(spark, "rix_fn", CurationOps.rankQueries).count() > 0)
    // the positional tier fences its own `_pbatches` ledger
    RetrievalIndex.buildPositions(evens, "rix_fnp", freshPath("fnp"))
    val e3 = intercept[IllegalArgumentException] {
      RetrievalIndex.extendPositions(odds, "rix_fnp", batchId = 3L)
    }
    assert(e3.getMessage.contains("out of sequence"))
    RetrievalIndex.extendPositions(odds, "rix_fnp", batchId = 1L)
  }

  test("the writer fence diagnoses an empty commit ledger and names the migration") {
    // pure-function checks on the shared fence (no tables needed):
    // an existing-but-empty marker (crash mid-overwrite) must read as a
    // named recoverable state, not a bare empty.max
    val e = intercept[IllegalArgumentException] {
      graft.core.WriterFence(Set.empty[Long], 1L, "SpecFamily")
    }
    assert(e.getMessage.contains("empty commit ledger"), e.getMessage)
    assert(e.getMessage.contains("SpecFamily"))
    // and the out-of-sequence error tells a pre-fence sparse ledger its
    // migration path (one compact resets the namespace)
    val e2 = intercept[IllegalArgumentException] {
      graft.core.WriterFence(Set(0L, 1L), 5L, "SpecFamily")
    }
    assert(e2.getMessage.contains("compact"), e2.getMessage)
    // in-sequence passes
    graft.core.WriterFence(Set(0L, 1L), 2L, "SpecFamily")
  }
}
