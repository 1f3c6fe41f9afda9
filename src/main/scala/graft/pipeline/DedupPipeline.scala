package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}

/** End-to-end corpus deduplication — the composition an LLM training-data
  * pipeline actually runs, built from the individually-verified operators:
  *
  *  1. exact dedup: hash-groupBy on canonicalized text (one shuffle with
  *     map-side combine) removes byte-identical duplicates BEFORE any
  *     similarity work — at web scale the exact-dup fraction is large and
  *     this is by far the cheapest reduction;
  *  2. near-dup pairs over the exact representatives: MinHash+LSH by
  *     default (banded equi-join, the 100 TB path), exact PPJoin on
  *     request (`exact = true`);
  *  3. cluster consolidation: connected components over the pair graph,
  *     min-id representative per cluster;
  *  4. keep-list: exact representatives that are not displaced by a
  *     smaller-id near-dup cluster member. Every kept doc id represents
  *     its exact-dup group and its near-dup cluster.
  *
  * Everything stays a lazy DataFrame plan; no driver-side loops over data.
  */
object DedupPipeline {

  final case class Result(
      /** (id, text) — documents surviving both dedup tiers */
      keep: DataFrame,
      /** (id, kept_as) — dropped doc → the id it was deduplicated into */
      dropped: DataFrame,
      /** (representative, n_docs, member_ids) near-dup clusters (size > 1) */
      clusters: DataFrame,
      /** single-row: n_docs, n_exact_dropped, n_neardup_dropped, n_kept */
      stats: DataFrame)

  /** @param docs      (id: long, text: string)
    * @param threshold Jaccard near-dup threshold
    * @param exact     true → exact PPJoin pair generation; false → MinHash
    *                  LSH (recall ≈ 1 above ~0.9 similarity, the scale path)
    */
  def run(
      spark: SparkSession,
      docs: DataFrame,
      threshold: Double = 0.8,
      exact: Boolean = false): Result = {
    val t1 = exactTier(docs)

    // ---- tier 2+3: near-dup pairs over representatives → clusters
    val pairs =
      (if (exact) Dedup.jaccardPairs(t1.reps, threshold)
       else Dedup.minhashLsh(t1.reps, threshold))
        .select(col("id_a").as("src"), col("id_b").as("dst"))
    finish(spark, docs, t1, pairs)
  }

  /** Incremental curation step — deduplicate a NEW batch against the
    * persisted near-dup index of the already-curated corpus WITHOUT
    * re-hashing history ([[Dedup.probeNearDupIndex]]: probe cost ∝ batch),
    * then extend the index with the batch's kept docs so the NEXT batch
    * probes this one too.
    *
    * Semantics are [[run]] with history frozen: tier-1 exact dedup within
    * the batch; near-dup edges = in-batch pairs over batch reps ∪ probe
    * hits against the index; connected components over that union; a
    * batch doc drops when its component holds a smaller id — an index doc
    * (ingest ids are monotone, so history always wins) or an earlier
    * batch doc. `kept_as` may therefore name an index doc: a member of
    * the already-curated corpus.
    *
    * Equals the from-scratch [[run]] over history∪batch except where
    * incremental dedup is INHERENTLY different: a batch doc that bridges
    * two separate history clusters cannot merge them (history is never
    * revised), and a batch doc similar only to a doc history DROPPED
    * finds no edge (the index holds the curated corpus, not its
    * discards). PipelineSpec asserts exact agreement on a bridge-free
    * corpus.
    *
    * @param indexTable name passed to [[Dedup.buildNearDupIndex]] when the
    *        curated corpus was indexed
    * @param batchId stamp for the index append (> 0; 0 is the build) —
    *        stable across replays of the same batch, unique otherwise
    *        (a streaming caller passes its epoch), per the
    *        [[Dedup.extendNearDupIndex]] exactly-once protocol
    * @param k,numHashes,bands MUST match the values the index was built
    *        with — band keys are derived from them, so a mismatch makes
    *        every probe miss silently AND appends incompatible postings
    */
  def runIncremental(
      spark: SparkSession,
      batch: DataFrame,
      indexTable: String,
      batchId: Long,
      threshold: Double = 0.8,
      exact: Boolean = false,
      extendIndex: Boolean = true,
      k: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8): Result = {
    val t1 = exactTier(batch)

    val inBatch =
      (if (exact) Dedup.jaccardPairs(t1.reps, threshold, k)
       else Dedup.minhashLsh(t1.reps, threshold, k, numHashes, bands))
        .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cross = Dedup.probeNearDupIndex(spark, indexTable, t1.reps, threshold,
        k, numHashes, bands)
      .select(col("batch_id").as("src"), col("index_id").as("dst"))

    val r = finish(spark, batch, t1, inBatch.unionByName(cross))
    if (!extendIndex) r
    else {
      // keep is consumed twice (index append + caller) and its DAG holds
      // the probe/verify joins — pin it once
      val keep = r.keep.localCheckpoint()
      Dedup.extendNearDupIndex(spark, keep, indexTable, batchId, k, numHashes, bands)
      r.copy(keep = keep)
    }
  }

  private final case class ExactTier(reps: DataFrame, exactDropped: DataFrame)

  /** Tier 1: exact dedup on canonical text — min-id representative per
    * identical-text group, (id → kept_as) for the rest.
    */
  private def exactTier(docs: DataFrame): ExactTier = {
    val canon = lower(trim(col("text")))
    val withKey = docs.withColumn("__key", canon)
    val repOf = withKey.select(col("id"), col("__key"))
      .join(withKey.groupBy("__key").agg(min(col("id")).as("__rep")), "__key")
      .select(col("id"), col("__rep"))
      .localCheckpoint() // reused by keep + dropped branches
    val exactDropped = repOf.filter(col("id") =!= col("__rep"))
      .select(col("id"), col("__rep").as("kept_as"))
    val reps = docs.join(
      repOf.filter(col("id") === col("__rep")).select("id"), Seq("id"))
    ExactTier(reps, exactDropped)
  }

  /** Tiers 3+4 over an edge set: connected components, min-id cluster
    * representative, keep/dropped partition, kept_as chaining, stats.
    * Components may contain non-batch nodes (index docs in the
    * incremental path); only `t1.reps` members can drop, and the
    * representative — the component min — never does.
    */
  private def finish(spark: SparkSession, docs: DataFrame, t1: ExactTier,
      pairs: DataFrame): Result = {
    val comp = ConnectedComponents.run(spark, pairs)
      .localCheckpoint() // reused by clusters + keep/dropped branches
    val clusterRep = comp.groupBy("component")
      .agg(min(col("id")).as("representative"),
        count(lit(1)).as("n_docs"),
        sort_array(collect_list(col("id"))).as("member_ids"))
    val clusters = clusterRep.select("representative", "n_docs", "member_ids")

    // keep = reps not displaced by a smaller cluster member (restricted to
    // this run's docs: index nodes are history's business, not this batch's)
    val nearDropped = comp
      .join(clusterRep.select(col("component"), col("representative")), "component")
      .filter(col("id") =!= col("representative"))
      .join(t1.reps.select("id"), Seq("id"))
      .select(col("id"), col("representative").as("kept_as"))
    val keep = t1.reps.join(nearDropped.select("id"), Seq("id"), "left_anti")

    // an exact-dropped doc's representative may itself be near-dropped in
    // tier 2 — chain the mapping so kept_as ALWAYS names a kept doc
    val exactFinal = t1.exactDropped
      .join(nearDropped.select(col("id").as("kept_as"), col("kept_as").as("__final")),
        Seq("kept_as"), "left")
      .select(col("id"), coalesce(col("__final"), col("kept_as")).as("kept_as"))
    val dropped = exactFinal.unionByName(nearDropped)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(t1.exactDropped.agg(count(lit(1)).as("n_exact_dropped")))
      .crossJoin(nearDropped.agg(count(lit(1)).as("n_neardup_dropped")))
      .withColumn("n_kept",
        col("n_docs") - col("n_exact_dropped") - col("n_neardup_dropped"))

    Result(keep, dropped, clusters, stats)
  }
}
