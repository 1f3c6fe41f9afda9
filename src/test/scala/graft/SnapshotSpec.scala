package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{IvmRollup, Maintenance, RetrievalIndex, Snapshot}
import graft.queries.CurationOps

/** Snapshot export/restore (round 10): the backup verb must round-trip
  * a family's rows, schema, bucket layout, and LEDGER — so the restored
  * family serves identically AND accepts the next fenced extend.
  */
class SnapshotSpec extends SparkSpec {

  private def docs = Tables(spark, sfDir).documents

  private def drop(table: String, sfx: Seq[String]): Unit =
    sfx.foreach { s =>
      val t = if (s.isEmpty) table else s"${table}_$s"
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def retrievalLadder(table: String): Unit = {
    drop(table, Seq("postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(table)
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), table, path)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), table,
      batchId = 1L)
    RetrievalIndex.deleteDocs(spark,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"), table, path,
      batchId = 2L)
  }

  test("export -> restore round-trips serve, ledger, and the next extend") {
    val src = "snap_src"
    retrievalLadder(src)
    val dest = graft.core.Scratch.path("snap_dest")
    val restored = "snap_restored"
    drop(restored, Seq("", "postings", "meta", "deleted"))
    val exported = Snapshot.export(spark, src, dest)
    assert(exported > 0L)
    Snapshot.restore(spark, dest, restored, graft.core.Scratch.path(restored))
    // identical serve (scores included — the _meta ledger's signed N
    // survived the round trip)
    assert(asSet(RetrievalIndex.topK(spark, restored, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, src, CurationOps.rankQueries)))
    // identical structural health
    assert(Maintenance.fsck(spark, restored, "retrieval")
      .filter(!col("ok")).count() == 0L)
    // the ledger round-tripped: the SAME next extend lands on both and
    // they stay equal — restore-from-backup is operationally live, not
    // a read-only copy
    val more = docs.filter(col("doc_id") % 7 === 3)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    RetrievalIndex.extend(more, src, batchId = 3L)
    RetrievalIndex.extend(more, restored, batchId = 3L)
    assert(asSet(RetrievalIndex.topK(spark, restored, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, src, CurationOps.rankQueries)))
  }

  test("delta chain restore == full restore; a compact breaks the chain loudly") {
    val src = "snap_src_inc"
    drop(src, Seq("", "postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(src)
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src, path)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), src,
      batchId = 1L)
    val base = graft.core.Scratch.path("snap_inc_base")
    val baseRows = Snapshot.export(spark, src, base)
    // history AFTER the base snapshot: a tombstone delete (stamp 2 —
    // appends a signed _meta row, and OVERWRITES the unstamped
    // _deleted frontier, so the delta must carry that table whole)
    RetrievalIndex.deleteDocs(spark,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"), src, path,
      batchId = 2L)
    val delta = graft.core.Scratch.path("snap_inc_delta")
    val deltaRows = Snapshot.export(spark, src, delta,
      incrementalFrom = Some(base))
    assert(deltaRows < baseRows,
      s"the delta ($deltaRows rows) must be smaller than the base " +
        s"($baseRows rows) — that is the whole point of incremental")
    val viaChain = "snap_inc_chain"
    drop(viaChain, Seq("", "postings", "meta", "deleted"))
    Snapshot.restore(spark, delta, viaChain, graft.core.Scratch.path(viaChain))
    assert(asSet(RetrievalIndex.topK(spark, viaChain, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, src, CurationOps.rankQueries)),
      "base + delta must serve exactly like the live family")
    assert(Maintenance.fsck(spark, viaChain, "retrieval")
      .filter(!col("ok")).count() == 0L)
    // compact rewrites stamp history -> the old base can no longer
    // anchor a delta; export must refuse, not silently mis-slice
    RetrievalIndex.compact(spark, src, path)
    val e = intercept[IllegalArgumentException] {
      Snapshot.export(spark, src, graft.core.Scratch.path("snap_inc_bad"),
        incrementalFrom = Some(base))
    }
    assert(e.getMessage.contains("compact"), e.getMessage)
  }

  test("three-link chains: base + delta + delta restore AND attach == live") {
    val src = "snap_src3l"
    drop(src, Seq("", "postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(src)
    RetrievalIndex.build(docs.filter(col("doc_id") % 3 === 0), src, path)
    val l0 = graft.core.Scratch.path("snap_3l_0")
    Snapshot.export(spark, src, l0)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 3 === 1), src,
      batchId = 1L)
    val l1 = graft.core.Scratch.path("snap_3l_1")
    Snapshot.export(spark, src, l1, incrementalFrom = Some(l0))
    RetrievalIndex.extend(docs.filter(col("doc_id") % 3 === 2), src,
      batchId = 2L)
    RetrievalIndex.deleteDocs(spark,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"), src, path,
      batchId = 3L)
    val l2 = graft.core.Scratch.path("snap_3l_2")
    Snapshot.export(spark, src, l2, incrementalFrom = Some(l1))
    val want = asSet(RetrievalIndex.topK(spark, src, CurationOps.rankQueries))
    val restored = "snap_3l_restored"
    drop(restored, Seq("", "postings", "meta", "deleted"))
    Snapshot.restore(spark, l2, restored, graft.core.Scratch.path(restored))
    assert(asSet(RetrievalIndex.topK(spark, restored,
      CurationOps.rankQueries)) == want)
    Snapshot.attach(spark, l2, "snap_3l_view")
    assert(asSet(RetrievalIndex.topK(spark, "snap_3l_view",
      CurationOps.rankQueries)) == want)
    // POINT-IN-TIME restore falls out of the chain design: any interior
    // link is itself a valid chain tip, so restoring l1 lands the
    // family as it stood at THAT export — ranked like a from-scratch
    // index of the first two slices
    val pitr = "snap_3l_pitr"
    drop(pitr, Seq("", "postings", "meta", "deleted"))
    Snapshot.restore(spark, l1, pitr, graft.core.Scratch.path(pitr))
    drop("snap_3l_pref", Seq("postings", "meta"))
    RetrievalIndex.build(docs.filter(col("doc_id") % 3 <= 1), "snap_3l_pref",
      graft.core.Scratch.path("snap_3l_pref"))
    assert(asSet(RetrievalIndex.topK(spark, pitr, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, "snap_3l_pref",
        CurationOps.rankQueries)))
  }

  test("attach serves a snapshot chain in place — no copy, same answers") {
    val src = "snap_src_att"
    drop(src, Seq("", "postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(src)
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src, path)
    val base = graft.core.Scratch.path("snap_att_base")
    Snapshot.export(spark, src, base)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), src,
      batchId = 1L)
    RetrievalIndex.deleteDocs(spark,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"), src, path,
      batchId = 2L)
    val delta = graft.core.Scratch.path("snap_att_delta")
    Snapshot.export(spark, src, delta, incrementalFrom = Some(base))
    val views = Snapshot.attach(spark, delta, "snap_att_view")
    assert(views.contains("snap_att_view_postings")
      && views.contains("snap_att_view_meta")
      && views.contains("snap_att_view_deleted"), views.toString)
    // the family's serve verb runs unchanged against the attached name
    assert(asSet(RetrievalIndex.topK(spark, "snap_att_view",
        CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, src, CurationOps.rankQueries)))
  }

  test("verify audits a chain read-only; a tampered directory is flagged by name") {
    val src = "snap_src_vfy"
    drop(src, Seq("", "postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(src)
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src, path)
    val base = graft.core.Scratch.path("snap_vfy_base")
    Snapshot.export(spark, src, base)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), src,
      batchId = 1L)
    val delta = graft.core.Scratch.path("snap_vfy_delta")
    Snapshot.export(spark, src, delta, incrementalFrom = Some(base))
    assert(Snapshot.verify(spark, delta).filter(!col("ok")).count() == 0L)
    // bit-rot: one data file vanishes from the BASE link's postings dir
    val dir = new java.io.File(s"$base/postings")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.delete())
    val bad = Snapshot.verify(spark, delta).filter(!col("ok"))
      .select("link", "table").collect().map(r => (r.getString(0), r.getString(1)))
    assert(bad.toSeq == Seq((base, "postings")), bad.mkString(","))
  }

  test("restore refuses a manifest-less directory and occupied targets") {
    val src = "snap_src2"
    retrievalLadder(src)
    val dest = graft.core.Scratch.path("snap_dest2")
    Snapshot.export(spark, src, dest)
    // crashed export: manifest missing -> loud refusal
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dest/_MANIFEST.json"), false)
    val e1 = intercept[IllegalArgumentException] {
      Snapshot.restore(spark, dest, "snap_never", graft.core.Scratch.path("snap_never"))
    }
    assert(e1.getMessage.contains("_MANIFEST.json"))
    // occupied target: src itself still exists under its own name
    Snapshot.export(spark, src, dest)
    val e2 = intercept[IllegalArgumentException] {
      Snapshot.restore(spark, dest, src, graft.core.Scratch.path(src))
    }
    assert(e2.getMessage.contains("already exists"))
  }

  test("join-view family (three logs + marker) snapshots and restores whole") {
    import spark.implicits._
    import graft.operators.IvmJoin
    val src = "snap_jv"
    Seq(src, s"${src}_fact", s"${src}_dim", s"${src}_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val fact = Seq((1L, 101L, 10.0), (2L, 201L, 30.0), (3L, 301L, 7.0))
      .toDF("k", "o", "v")
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    IvmJoin.build(fact, dim, "k", src, graft.core.Scratch.path(src), 4)
    IvmJoin.applyDelta(spark, src, "k",
      Seq((2L, 202L, 5.0)).toDF("k", "o", "v").withColumn("dn", lit(1L)),
      dim.limit(0).withColumn("dn", lit(1L)), batchId = 1L)
    val dest = graft.core.Scratch.path("snap_jv_dest")
    Snapshot.export(spark, src, dest)
    val restored = "snap_jv_restored"
    Seq(restored, s"${restored}_fact", s"${restored}_dim", s"${restored}_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Snapshot.restore(spark, dest, restored, graft.core.Scratch.path(restored))
    assert(asSet(IvmJoin.serve(spark, restored)) == asSet(IvmJoin.serve(spark, src)))
    // the marker round-tripped: the SAME next delta lands on both
    // through the writer fence and they stay equal
    val d2f = Seq((1L, 102L, 9.0)).toDF("k", "o", "v").withColumn("dn", lit(1L))
    val d2d = dim.limit(0).withColumn("dn", lit(1L))
    IvmJoin.applyDelta(spark, src, "k", d2f, d2d, batchId = 2L)
    IvmJoin.applyDelta(spark, restored, "k", d2f, d2d, batchId = 2L)
    assert(asSet(IvmJoin.serve(spark, restored)) == asSet(IvmJoin.serve(spark, src)))
  }

  test("export refuses an unknown family; rollup (markerless, single-table) round-trips") {
    intercept[IllegalArgumentException] {
      Snapshot.export(spark, "snap_no_such_family",
        graft.core.Scratch.path("snap_nowhere"))
    }
    val src = "snap_ivm"
    spark.sql(s"DROP TABLE IF EXISTS $src")
    val o = Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    IvmRollup.build(o, col("o_custkey"), col("o_totalprice"), src,
      graft.core.Scratch.path(src))
    val dest = graft.core.Scratch.path("snap_ivm_dest")
    Snapshot.export(spark, src, dest)
    val restored = "snap_ivm_restored"
    spark.sql(s"DROP TABLE IF EXISTS $restored")
    Snapshot.restore(spark, dest, restored, graft.core.Scratch.path(restored))
    assert(asSet(IvmRollup.serve(spark, restored))
      == asSet(IvmRollup.serve(spark, src)))
  }

  // --------------------------------------------------------------------
  // round 11: consistent cuts, content digests, retention

  test("exportAtCut: the in-flight crash-window stamp never leaks into the snapshot") {
    val src = "snap_cut_src"
    drop(src, Seq("", "postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(src)
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src, path)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), src,
      batchId = 1L)
    // mid-epoch: stamp 2's DATA lands, its marker does not — the one
    // legal crash-window state a live stream exposes at any instant
    RetrievalIndex.applyExtend(docs.filter(col("doc_id") % 7 === 3)
      .withColumn("doc_id", col("doc_id") + 1000000L), src, batchId = 2L)
    val dest = graft.core.Scratch.path("snap_cut_dest")
    val (cut, rows) = Snapshot.exportAtCut(spark, src, "retrieval", dest)
    assert(cut == 1L && rows > 0L)
    // the snapshot holds NO stamp past the cut — the leak-free pin
    val snapped = spark.read.parquet(s"$dest/postings")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(snapped == Set(0L, 1L), snapped.toString)
    // restore lands the commit-boundary state exactly: it serves like a
    // from-scratch index of the committed prefix, and fsck reads clean
    val restored = "snap_cut_restored"
    drop(restored, Seq("", "postings", "meta", "deleted"))
    Snapshot.restore(spark, dest, restored, graft.core.Scratch.path(restored))
    assert(Maintenance.fsck(spark, restored, "retrieval")
      .filter(!col("ok")).count() == 0L)
    drop("snap_cut_ref", Seq("postings", "meta"))
    RetrievalIndex.build(docs, "snap_cut_ref",
      graft.core.Scratch.path("snap_cut_ref"))
    assert(asSet(RetrievalIndex.topK(spark, restored, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, "snap_cut_ref", CurationOps.rankQueries)))
    // contrast: a PLAIN export of the same live family captures the
    // in-flight stamp — which is exactly why ITS contract stays
    // quiescence, and the cut verb exists
    val dirty = graft.core.Scratch.path("snap_cut_dirty")
    Snapshot.export(spark, src, dirty)
    val dirtyStamps = spark.read.parquet(s"$dirty/postings")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dirtyStamps == Set(0L, 1L, 2L), dirtyStamps.toString)
    // the markerless rollup has no committed cut to read
    intercept[IllegalArgumentException] {
      Snapshot.exportAtCut(spark, "snap_ivm", "rollup",
        graft.core.Scratch.path("snap_cut_nowhere"))
    }
  }

  test("deep verify catches count-preserving corruption the count audit cannot") {
    import spark.implicits._
    val src = "snap_deep_src"
    drop(src, Seq("", "postings", "meta", "deleted"))
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src,
      graft.core.Scratch.path(src))
    val dest = graft.core.Scratch.path("snap_deep_dest")
    Snapshot.export(spark, src, dest)
    // tamper: the meta dir rewrites with the SAME row count and a
    // different N — the corruption a pre-restore count audit blesses
    Seq((999999L, 0L)).toDF("n_docs", "batch_id")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dest/meta")
    assert(Snapshot.verify(spark, dest, deep = false)
      .filter(!col("ok")).count() == 0L,
      "the count-only audit is blind to this tamper — that is the point")
    val bad = Snapshot.verify(spark, dest).filter(!col("ok")).collect()
    assert(bad.length == 1 && bad.head.getString(1) == "meta",
      bad.mkString(","))
    assert(bad.head.getString(3).contains("digest"), bad.head.getString(3))
  }

  test("a compact that reproduces the parent's stamp set still breaks the chain") {
    val src = "snap_hole_src"
    drop(src, Seq("", "postings", "meta", "deleted"))
    val path = graft.core.Scratch.path(src)
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src, path)
    val base = graft.core.Scratch.path("snap_hole_base") // parent stamps: {0}
    Snapshot.export(spark, src, base)
    RetrievalIndex.extend(docs.filter(col("doc_id") % 2 === 1), src,
      batchId = 1L)
    // the round-10 advice hole: a DEFAULT compact folds history back to
    // exactly {0} — a fresh build's stamp set — so the stamp-subset
    // check alone would bless a delta that silently omits the fold
    RetrievalIndex.compact(spark, src, path)
    val e = intercept[IllegalArgumentException] {
      Snapshot.export(spark, src, graft.core.Scratch.path("snap_hole_d"),
        incrementalFrom = Some(base))
    }
    assert(e.getMessage.contains("full snapshot"), e.getMessage)
    // the count-only fence (auditParent = false) catches this staging too
    val e2 = intercept[IllegalArgumentException] {
      Snapshot.export(spark, src, graft.core.Scratch.path("snap_hole_d2"),
        incrementalFrom = Some(base), auditParent = false)
    }
    assert(e2.getMessage.contains("full snapshot"), e2.getMessage)
  }

  test("export refuses siblings that collide on a snapshot directory") {
    import spark.implicits._
    Seq("snap_clash", "snap_clash_base").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, "x")).toDF("id", "v").write
      .option("path", graft.core.Scratch.path("snap_clash"))
      .format("parquet").saveAsTable("snap_clash")
    Seq((2L, "y")).toDF("id", "v").write
      .option("path", graft.core.Scratch.path("snap_clash_base"))
      .format("parquet").saveAsTable("snap_clash_base")
    val e = intercept[IllegalArgumentException] {
      Snapshot.export(spark, "snap_clash",
        graft.core.Scratch.path("snap_clash_dest"))
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("warm standby: cut-delta links ship to a replica in lockstep") {
    val primary = "snap_wsp"
    drop(primary, Seq("", "postings", "meta", "deleted"))
    val ppath = graft.core.Scratch.path(primary)
    val standby = "snap_wss"
    drop(standby, Seq("", "postings", "meta", "deleted"))
    val spath = graft.core.Scratch.path(standby)
    // primary epoch 0, full export at the cut, restore = the seed
    graft.streaming.RetrievalStream.foldEpoch(
      docs.filter(col("doc_id") % 4 === 0), 0L, primary, ppath)
    val full = graft.core.Scratch.path("snap_ws_full")
    Snapshot.exportAtCut(spark, primary, "retrieval", full)
    Snapshot.restore(spark, full, standby, spath)
    // a FULL link refuses applyLink — seeding is restore's job
    val eFull = intercept[IllegalArgumentException] {
      Snapshot.applyLink(spark, full, standby, spath, "retrieval")
    }
    assert(eFull.getMessage.contains("restore"), eFull.getMessage)
    // epochs 1..3 on the primary, one cut delta per epoch
    var parent = full
    val links = (1 to 3).map { e =>
      graft.streaming.RetrievalStream.foldEpoch(
        docs.filter(col("doc_id") % 4 === e), e.toLong, primary, ppath)
      val d = graft.core.Scratch.path(s"snap_ws_d$e")
      Snapshot.exportAtCut(spark, primary, "retrieval", d,
        incrementalFrom = Some(parent))
      parent = d
      d
    }
    // shipping link 2 before link 1 refuses with the stamp arithmetic
    val eOrder = intercept[IllegalArgumentException] {
      Snapshot.applyLink(spark, links(1), standby, spath, "retrieval")
    }
    assert(eOrder.getMessage.contains("export order"), eOrder.getMessage)
    links.foreach { d =>
      assert(Snapshot.applyLink(spark, d, standby, spath, "retrieval") > 0L)
      // re-shipping the same link is the restartable no-op
      assert(Snapshot.applyLink(spark, d, standby, spath, "retrieval") == 0L)
    }
    assert(asSet(RetrievalIndex.topK(spark, standby, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, primary, CurationOps.rankQueries)))
    assert(Maintenance.fsck(spark, standby, "retrieval")
      .filter(!col("ok")).count() == 0L)
    // a delete ships too — and BIRTHS the _deleted ledger on the replica
    RetrievalIndex.deleteDocs(spark,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"), primary, ppath,
      batchId = 5L)
    val dDel = graft.core.Scratch.path("snap_ws_ddel")
    Snapshot.exportAtCut(spark, primary, "retrieval", dDel,
      incrementalFrom = Some(parent))
    Snapshot.applyLink(spark, dDel, standby, spath, "retrieval")
    assert(asSet(RetrievalIndex.topK(spark, standby, CurationOps.rankQueries))
      == asSet(RetrievalIndex.topK(spark, primary, CurationOps.rankQueries)),
      "a shipped delete must shrink the replica's ranking N too")
  }

  test("standby on the IVF family: the frozen centroids ride the overwrite branch") {
    val e = Tables(spark, sfDir).embeddings
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val primary = "snap_ivfp"; val standby = "snap_ivfs"
    Seq(primary, standby).foreach(t =>
      drop(t, Seq("centroids", "cells", "batches", "deleted")))
    val ppath = graft.core.Scratch.path(primary)
    graft.operators.IvfIndex.build(corpus.filter(col("id") % 2 === 0),
      primary, ppath, nCells = 8, iters = 2)
    val full = graft.core.Scratch.path("snap_ivf_full")
    Snapshot.exportAtCut(spark, primary, "ivf", full)
    Snapshot.restore(spark, full, standby, graft.core.Scratch.path(standby))
    graft.operators.IvfIndex.extend(spark, corpus.filter(col("id") % 2 === 1),
      primary, batchId = 1L)
    val d1 = graft.core.Scratch.path("snap_ivf_d1")
    Snapshot.exportAtCut(spark, primary, "ivf", d1,
      incrementalFrom = Some(full))
    // the delta carries the UNSTAMPED centroids whole; applyLink
    // overwrites the replica's copy in place (idempotent — frozen)
    assert(Snapshot.applyLink(spark, d1, standby,
      graft.core.Scratch.path(standby), "ivf") > 0L)
    assert(asSet(graft.operators.IvfIndex.topK(spark, standby, queries,
        k = 5, nProbe = 4))
      == asSet(graft.operators.IvfIndex.topK(spark, primary, queries,
        k = 5, nProbe = 4)))
  }

  test("prune refuses when the kept chain fails verify; attach gates on the count audit") {
    val src = "snap_pr_src"
    drop(src, Seq("", "postings", "meta", "deleted"))
    RetrievalIndex.build(docs.filter(col("doc_id") % 2 === 0), src,
      graft.core.Scratch.path(src))
    val keepDir = graft.core.Scratch.path("snap_pr_keep")
    val oldDir = graft.core.Scratch.path("snap_pr_old")
    Snapshot.export(spark, src, oldDir)
    Snapshot.export(spark, src, keepDir)
    // damage the KEPT chain: one postings file vanishes — prune must
    // refuse and delete NOTHING (the old epoch is still the only good one)
    val dir = new java.io.File(s"$keepDir/postings")
    assert(dir.listFiles().filter(_.getName.endsWith(".parquet")).head.delete())
    val e = intercept[IllegalArgumentException] {
      Snapshot.prune(spark, keepDir, Seq(oldDir))
    }
    assert(e.getMessage.contains("refusing to delete"), e.getMessage)
    assert(new java.io.File(oldDir).exists(),
      "superseded chain must survive a refused prune")
    // the DR read path sees the same damage up front (count audit)...
    val e2 = intercept[IllegalArgumentException] {
      Snapshot.attach(spark, keepDir, "snap_pr_view")
    }
    assert(e2.getMessage.contains("count audit"), e2.getMessage)
    // ...and audit = false stays the explicit lazy-views escape hatch
    assert(Snapshot.attach(spark, keepDir, "snap_pr_view",
      audit = false).nonEmpty)
  }
}
