package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Integrity, Packing}

/** The full training-data curation flow, composed from the
  * individually-verified operators — what a user of this library actually
  * runs over a raw corpus:
  *
  *  1. quality gate: hashed-feature linear logit
  *     ([[TextFunctions.hashedLinearLogit]]) — map-only, the cheapest
  *     reduction, so it runs FIRST and everything later touches fewer
  *     rows;
  *  2. dedup: [[DedupPipeline.run]] (exact tier → MinHash-LSH near-dup
  *     tier → connected-components keep-list);
  *  3. decontamination: drop documents sharing ≥ `contamGrams` distinct
  *     5-gram spans with the benchmark set (the q59 shape: benchmark
  *     grams broadcast, corpus side stays partitioned);
  *     (3b, optional) per-source cap — the q112 stage, bounding any one
  *     domain's contribution to `maxPerSource` surviving docs;
  *  4. packing: token-count prefix sum → fixed-budget training shards
  *     ([[Packing.packSequences]], the two-pass distributed scan);
  *  5. manifest: per-shard doc/token counts + order-independent content
  *     digests ([[Integrity.rowHash]] xor/sum) — the artifact a consumer
  *     uses to verify the shards it downloaded are the shards we wrote.
  *
  * Stage order is load-bearing: quality before dedup shrinks the
  * similarity workload; dedup before decontamination means a benchmark
  * hit kills ONE representative, not a cluster of copies rediscovered
  * every run. Every inter-stage frame is a lazy plan; the only driver
  * values are the operators' own documented bounded actions.
  *
  * Attrition accounting mirrors q82's filter-funnel discipline: each
  * dropped doc carries the FIRST stage that rejected it, so
  * `|docs| == |kept| + |dropped|` exactly and the funnel is additive.
  */
object CorpusCuration {

  final case class Result(
      /** (id, text, n_subwords, off, shard) — curated corpus, shard =
        * fixed-budget training-sequence index of the doc's first token
        * (null for empty docs — they occupy no sequence)
        */
      kept: DataFrame,
      /** (id, stage) — stage ∈ quality | dedup | decontamination |
        * source_cap (last only when `maxPerSource` is set)
        */
      dropped: DataFrame,
      /** per-shard (shard, n_docs, n_tokens, xor_hash, sum_hash) */
      manifest: DataFrame,
      /** (stage, n) attrition counts + a final `kept` row */
      funnel: DataFrame)

  /** @param docs  (id: long, text: string), ids unique; must also carry
    *              `sourceCol` when `maxPerSource` is set
    * @param bench benchmark/eval documents (id: long, text: string) —
    *              the contamination reference, small enough to broadcast
    *              as distinct 5-grams (eval suites are KBs against a
    *              corpus of TBs; that asymmetry is the whole design)
    * @param maxPerSource optional per-domain cap (the q112 stage): after
    *              decontamination, keep only the top-`maxPerSource`
    *              surviving docs per `sourceCol` by token count (id asc
    *              tiebreak — the q112 total order), so one over-crawled
    *              domain cannot flood the shard mix. None = stage off,
    *              contract unchanged.
    */
  def run(spark: SparkSession, docs: DataFrame, bench: DataFrame,
      threshold: Double = 0.8, contamGrams: Long = 2L,
      shardBudget: Long = 4096L, maxPerSource: Option[Int] = None,
      sourceCol: String = "source"): Result = {
    // score once, pin once: the gate, the drop record, and the packing
    // weights all read this frame
    val scored = docs.select(col("id"), col("text"),
        TextFunctions.hashedLinearLogit(col("text")).as("logit"),
        TextFunctions.subwordCount(coalesce(col("text"), lit("")))
          .cast("long").as("wt"))
      .localCheckpoint()

    // ---- 1. quality gate (map-only)
    val qKeep = scored.filter(col("logit") > 0)
    val qDrop = scored.filter(!(col("logit") > 0))
      .select(col("id"), lit("quality").as("stage"))

    // ---- 2. dedup (exact -> near-dup -> keep-list)
    val dd = DedupPipeline.run(spark, qKeep.select(col("id"), col("text")), threshold)
    val dedupDrop = dd.dropped.select(col("id"), lit("dedup").as("stage"))
    // keep feeds the contamination gram scan AND the left_anti below (which
    // itself fans into two more joins); pin it once so the LSH/verify/CC
    // dedup DAG above DedupPipeline's internal checkpoints never replays —
    // the runIncremental:111 discipline applied to the batch composition
    val keep = dd.keep.localCheckpoint()

    // ---- 3. decontamination (q59 shape; representatives only, so a
    // benchmark hit can't resurrect next run as a surviving near-dup)
    def grams(df: DataFrame) = df.select(col("id"),
      explode(array_distinct(TextFunctions.wordNgrams(col("text"), 5))).as("gram"))
    val benchGrams = bench
      .select(explode(array_distinct(TextFunctions.wordNgrams(col("text"), 5))).as("gram"))
      .distinct()
    val contaminated = grams(keep)
      .join(broadcast(benchGrams), "gram")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= contamGrams)
      .select("id")
    val decontamDrop = contaminated.select(col("id"), lit("decontamination").as("stage"))
    val clean0 = keep.join(contaminated, Seq("id"), "left_anti")

    // ---- 3b. optional per-source cap (the q112 stage, same rank-limit-
    // pushdown plan: Partial WindowGroupLimit bounds every map task at
    // maxPerSource rows per source before the shuffle). Runs AFTER dedup
    // and decontamination so the cap's budget is spent on unique, clean
    // documents, not on copies about to be dropped anyway.
    val (clean, capDrop) = maxPerSource match {
      case None => (clean0, None)
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(sourceCol))
          .orderBy(col("wt").desc, col("id").asc)
        val ranked = clean0
          .join(docs.select(col("id"), col(sourceCol)), "id")
          .join(scored.select(col("id"), col("wt")), "id")
          .withColumn("__rnk", row_number().over(w))
        val kept = ranked.filter(col("__rnk") <= cap)
          .select(clean0.columns.map(col): _*)
        val drop = ranked.filter(col("__rnk") > cap)
          .select(col("id"), lit("source_cap").as("stage"))
        (kept, Some(drop))
    }

    // ---- 4. packing into fixed-budget shards (ascending-id = ingest
    // order; easiest-first curriculum order is the q108 variant)
    val packed = Packing.packSequences(
      clean.join(scored.select(col("id"), col("wt")), "id").select("id", "wt"),
      shardBudget)
    val kept = packed
      .join(clean.select(col("id"), col("text")), "id")
      .select(col("id"), col("text"), col("wt").as("n_subwords"),
        col("off"), col("first_seq").as("shard"))

    // ---- 5. per-shard manifest with order-independent digests
    val manifest = kept
      .select(col("shard"), col("n_subwords"),
        Integrity.rowHash(Seq(col("id"), col("text"))).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_subwords")).as("n_tokens") +: Integrity.digestAggs("h"): _*)

    val dropped = capDrop.foldLeft(
      qDrop.unionByName(dedupDrop).unionByName(decontamDrop))(_ unionByName _)
    val funnel = dropped.groupBy("stage").agg(count(lit(1)).as("n"))
      .unionByName(kept.groupBy(lit("kept").as("stage")).agg(count(lit(1)).as("n")))
    Result(kept, dropped, manifest, funnel)
  }
}
