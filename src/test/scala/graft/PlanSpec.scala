package graft

/** Plan-shape assertions: the optimizations we rely on at scale must be
  * visible in the physical plan, not assumed — filter/projection pushdown
  * into the parquet scan, broadcast joins on dimensions, no cartesian
  * products in blocked similarity joins.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02 pushes filters and prunes columns at the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_shipdate"), "shipdate filter should be pushed")
    // pruned read schema: only the 5 needed columns, not all 11
    assert(!p.contains("l_returnflag"), "unused column must not be read")
  }

  test("q03 broadcasts the nation dimension") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q23 lookup join is a broadcast hash join, not a shuffle join") {
    val p = plan("q23_lookup_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q25 blocked similarity join contains no cartesian product") {
    val p = plan("q25_fuzzy_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q42 jaccard candidates come from an equi join (no nested loop)") {
    val p = plan("q42_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize the AQE plan — codegen spans only exist post-execution
    df.queryExecution.executedPlan.toString
  }

  test("q43 minhash LSH candidates come from a band-key equi join") {
    val p = plan("q43_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q44 simhash pairs come from a band equi join, and q44b clusters stay join-based") {
    val p = plan("q44_simhash_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val p2 = plan("q44b_neardup_clusters")
    assert(!p2.contains("CartesianProduct"), p2)
    assert(!p2.contains("BroadcastNestedLoopJoin"), p2)
  }

  test("q71 containment candidates come from the prefix/index equi join") {
    val p = plan("q71_containment_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cosinePairs above the measured bound has no cartesian / nested-loop join") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.core.Tables(spark, sfDir).embeddings
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // localThreshold = 0 simulates a corpus past the exact-tier bound:
    // the q53/q70 pair plan at scale must be the LSH bucket equi-join
    val df = graft.operators.VectorOps.cosinePairs(
      corpus, threshold = 0.40, dim = 64, localThreshold = 0L)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q78 interval-overlap candidates come from the bin equi join") {
    val p = plan("q78_session_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q80 co-purchase edge build is an order-key equi self-join, no nested loop") {
    // the query's own final plan starts at the iteration checkpoints
    // (Scan ExistingRDD), so assert on the quadratic-risk part directly:
    // the capped basket self-join that generates the edges
    import org.apache.spark.sql.functions.{col, count, lit}
    val li0 = graft.core.Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey"))
    val ok = li0.groupBy("l_orderkey").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= 100).select("l_orderkey")
    val li = li0.join(ok, "l_orderkey")
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val p = edges.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q84 source overlap joins on the canonical key, never source x source") {
    val p = plan("q84_source_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q75 profiles every column in ONE scan of the table") {
    val p = plan("q75_column_profile")
    // count detail-section node headers ("(n) Scan parquet"), not every
    // textual mention — FormattedMode prints each node in the tree AND
    // in the numbered detail list
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected a single-pass profile, saw $scans scans:\n$p")
  }

  test("q112 source cap gets the partial rank-limit pushed below the shuffle") {
    // the skew story rests on Catalyst's rank-limit pushdown: a Partial
    // WindowGroupLimit must bound every map task at K rows per source
    // BEFORE the exchange, and the Final one re-bounds after — if an
    // optimizer change drops either, a skewed source would again ship its
    // full document list to one reduce task
    val df = SparkEntry.queries("q112_source_cap")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Partial") && p.contains("Final"),
      "expected both Partial and Final WindowGroupLimit:\n" + p)
    // anchor on the window's own hash-partitioned shuffle, NOT the outer
    // range exchange the canonical-order wrapper adds; the plan prints
    // top-down, so Final sits before the shuffle and Partial after it
    val ex = p.indexOf("Exchange hashpartitioning")
    val finalIdx = p.indexOf("WindowGroupLimit")
    val partialIdx = p.lastIndexOf("WindowGroupLimit")
    assert(ex >= 0 && finalIdx >= 0 && finalIdx < ex && partialIdx > ex,
      s"expected Final above / Partial below the window shuffle (final=$finalIdx ex=$ex partial=$partialIdx):\n" + p)
  }

  test("q55 stratified sample is shuffle-free (pure filter over the scan)") {
    // the whole point of the hash gate: membership must not require data
    // movement, so the plan has no Exchange at all (the canonical-order
    // sort the oracle wrapper adds is the only permissible one)
    val df = graft.operators.Sampling.stratifiedHash(
      graft.core.Tables(spark, sfDir).documents,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("lang"),
      Map("en" -> 30), defaultPct = 60)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), p)
  }

  test("q58 chunking is a map-only explode (no Exchange)") {
    val df = graft.operators.Chunker.fixedChunks(
      graft.core.Tables(spark, sfDir).documents,
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), size = 200, overlap = 40)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), "explode should lower to Generate")
  }

  test("q59 decontamination joins the corpus against a broadcast gram table") {
    val p = plan("q59_decontamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    val p = executedPlan("q01_pricing_summary")
    assert(p.contains("*(") || p.contains("WholeStageCodegen"), p.take(1500))
  }

  test("custom indel expression does not break codegen in q33's plan") {
    val p = executedPlan("q33_indel_pairs")
    assert(p.contains("*(") || p.contains("WholeStageCodegen"), p.take(1500))
  }

  test("q63 quantization and q64 redaction are map-only (no Exchange)") {
    import org.apache.spark.sql.functions.col
    val q = graft.operators.VectorOps.scalarQuantize(
      graft.core.Tables(spark, sfDir).embeddings, col("vec_id"), col("embedding"))
    val pq = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!pq.contains("Exchange"), pq)
    val r = graft.core.Tables(spark, sfDir).documents
      .select(graft.functions.TextFunctions.redactPii(col("text")))
    val pr = r.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!pr.contains("Exchange"), pr)
  }

  test("q62 packing has no global single-partition sort or window funnel") {
    // the distributed prefix-sum scan must not lower to a
    // SinglePartition exchange (the global-window anti-pattern); range
    // repartitioning for the in-order scan is the only exchange allowed
    val df = graft.operators.Packing.packSequences(
      graft.core.Tables(spark, sfDir).documents.selectExpr(
        "doc_id AS id", "n_chars AS wt"),
      budget = 256)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("AQE splits a skewed shuffle join at runtime (complements Salt)") {
    // operators.Salt is the explicit cure; AQE's OptimizeSkewedJoin is the
    // runtime one. Verify the engine's plans actually let AQE fire: a
    // 90%-one-key fact joined on a sort-merge join must show skew=true
    // partitions in the FINAL adaptive plan, with results unchanged.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val fact = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("payload"))
      val dim = spark.range(200000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "k")
      assert(joined.count() == 200000L)
      // drive THIS QueryExecution's physical plan so ITS adaptive plan
      // finalizes (every DataFrame action spawns a fresh execution)
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() == 200000L)
      val p = qe.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(2000))
      assert(p.contains("skew=true"), "AQE skew split did not fire:\n" + p.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q140 computes both lag columns in ONE window operator") {
    // count tree nodes ("Window (n)"), not the detail sections that repeat
    // each operator's name a second time
    val p = plan("q140_path_trigrams")
    val windows = "Window \\(\\d+\\)".r.findAllIn(p).size
    // one window for the two lags + one for the rank over the top-10
    assert(windows <= 2, s"expected <= 2 Window operators, plan:\n${p.take(3000)}")
  }

  test("q136 audit reads orders for FK keys + customer only (base is checkpointed)") {
    val p = plan("q136_quality_audit")
    // the single-pass constraint block is materialized by localCheckpoint
    // (Scan ExistingRDD), so the live plan scans parquet only for the FK
    // distinct-key probe and the customer dimension — one Location each
    val scans = "Location: InMemoryFileIndex".r.findAllIn(p).size
    assert(scans <= 2, s"expected <= 2 parquet scans, got $scans:\n${p.take(3000)}")
    // and the FK probe must be column-pruned to the key
    assert(p.contains("struct<o_custkey:bigint>"), "FK probe should read only o_custkey")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q134 shingle-containment candidates come from the posting equi join") {
    val p = plan("q134_containment_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q139 BFS rounds are equi joins only (no nested loop, no cartesian)") {
    val p = plan("q139_bfs_hops")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q148 rendezvous rebalance is in-row work: no join, no explode") {
    val p = plan("q148_rebalance_plan")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), "shard weights must fold in-row, not explode")
  }

  test("q144/q145 candidate generation has no cartesian product") {
    for (q <- Seq("q144_lev_band_pairs", "q145_retrieval_ndcg")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q150's replay plan contains no single-task global Window") {
    // the running max is the two-pass Packing scan; a `Window` operator
    // here would mean the plan regressed to the ORDER-BY-all funnel
    val p = plan("q150_lateness_audit")
    assert(!p.contains("Window"), p)
  }

  test("q151's cascade hops are broadcast joins (deletion list ships, tables don't)") {
    val p = plan("q151_deletion_plan")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "no table-sized shuffle join in the cascade")
  }

  test("q156's post-probe plan is pure union+agg (the window rode the one pinned job)") {
    // the RANGE-frame window lives in the localCheckpoint job; the final
    // plan must only branch/agg the pinned purchases — any Window or
    // Join here would mean a second per-user sort crept in
    val p = plan("q156_linear_touch")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q158 expansion candidates come from equi joins (no cartesian, no nested loop)") {
    val p = plan("q158_query_expansion")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q162's incremental probe stays equi-join (no cartesian, no nested loop)") {
    val p = plan("q162_incremental_leakage")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q157/q164/q166 execute the scale path: no Window operator anywhere") {
    // round-10: the last three one-task global windows left the ENGINE
    // plans — q157/q164 rank via Ranks.globalRowNumber, q166's prefix
    // sums via Ranks.globalRunningSums. q171 keeps the window
    // formulation (the in-engine equality theorem), so these three must
    // stay window-free or the scale promise is silently broken.
    Seq("q157_auc_eval", "q164_calibration_bins", "q166_ks_drift").foreach { q =>
      assert(!plan(q).contains("Window"), s"$q grew a Window operator")
    }
  }

  test("q171 (the window twin) still formulates the rank as a global window") {
    // the equality theorem needs both sides alive: q171's point IS the
    // one-task window, checked bit-identical to q157's scan every round
    assert(plan("q171_scaled_rank_auc").contains("Window"))
  }

  test("q163's benchmark span set joins by broadcast (the eval side is small by definition)") {
    val p = plan("q163_exact_decontam")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("serveAtCut views push the cut filter into the parquet scan") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables(spark, sfDir).documents
    val t = "plan_cut_rix"
    Seq("postings", "meta", "deleted").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS ${t}_$s"))
    graft.operators.RetrievalIndex.build(
      docs.filter(col("doc_id") % 2 === 0), t, graft.core.Scratch.path(t))
    graft.operators.RetrievalIndex.extend(
      docs.filter(col("doc_id") % 2 === 1), t, batchId = 1L)
    graft.operators.Snapshot.serveAtCut(spark, t, "retrieval", "plan_cut_view")
    // the committed-cut read must be a SCAN-level slice — the replica's
    // serve plans through the views are the family's own plans plus one
    // pushed predicate, not a post-scan filter over the whole log
    val p = spark.table("plan_cut_view_postings").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters:") &&
      p.contains("LessThanOrEqual(batch_id,1)"), p)
  }
}
