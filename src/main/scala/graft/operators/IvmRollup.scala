package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted incremental aggregate maintenance (IVM) — the maintained-
  * state twin of the q152 in-query derivation: the per-key rollup lives
  * ON DISK as a bucketed delta log, each changelog batch folds in with
  * one append whose cost is ∝ batch (never ∝ history), and reads fold
  * the log without a shuffle.
  *
  * State model (delta log, not merge-on-write):
  *   (key, dn: BIGINT, dr: DECIMAL(38,2), batch_id: BIGINT)
  * `build` writes the base aggregation as batch 0; `applyDelta` appends
  * one aggregated row per touched key stamped with the batch id, laid
  * out through the table's existing bucket spec (`insertInto`, the
  * [[RetrievalIndex.extend]] move) so reads stay co-located forever.
  *
  * Exactly-once without a commit marker: a batch's appended rows are a
  * DETERMINISTIC aggregate of the changelog (longs and decimals — both
  * associative-exact, no float drift), keyed by (key, batch_id). A crash
  * mid-append followed by a replay can only produce byte-identical
  * duplicate rows, and [[serve]] collapses those with a per-(key,
  * batch_id) fold before summing. Contrast [[RetrievalIndex.extend]],
  * whose postings are not per-batch-keyed and so need the documented
  * "stamp with batch id in production" caveat — here the stamp IS the
  * design.
  *
  * Read path: the table is bucketed by key, so HashPartitioning(key)
  * satisfies the clustering of BOTH aggregation levels ((key, batch_id)
  * then (key)) — [[serve]] runs with zero exchanges. [[compact]] folds
  * the log back to a single batch-0 base when it grows (cost = one
  * table rewrite, amortized over any number of appends).
  *
  * Reference trigger: the reference recomputes its consolidated outputs
  * from scratch each run (`consolidate_group`, ranked_issues rebuild) —
  * this is the shape those pipelines need at 100 TB, where per-batch
  * maintenance is the only affordable contract.
  */
object IvmRollup {

  private val Dec = DecimalType(38, 2)

  /** Aggregate `rows` per `key` (count + decimal-exact sum of `value`)
    * and persist as the batch-0 base, bucketed by key. Overwrite: a
    * rerun or a crashed-then-retried build replaces, never extends.
    */
  def build(rows: DataFrame, key: Column, value: Column,
      table: String, path: String, nBuckets: Int = 16): Unit = {
    val base = rows.groupBy(key.as("key"))
      .agg(count(lit(1)).as("dn"),
        sum(value.cast(Dec)).cast(Dec).as("dr"))
      .withColumn("batch_id", lit(0L))
    graft.sources.TableWriter.writeBucketed(base, table, path, "key", nBuckets)
  }

  /** Fold one changelog batch into the table. `changes` carries signed
    * rows (key, dn, dr): +1/+value for an insert, −1/−old value for a
    * delete, a ±pair for an update. They are aggregated to one row per
    * touched key, stamped with `batchId` (> 0; 0 is the base), and
    * appended through the bucket spec. Write cost ∝ |touched keys|.
    */
  def applyDelta(spark: SparkSession, table: String,
      changes: DataFrame, batchId: Long, nBuckets: Int = 16): Unit = {
    require(batchId > 0L, s"batchId must be positive (0 is the base): $batchId")
    changes.groupBy(col("key"))
      .agg(sum(col("dn")).as("dn"),
        sum(col("dr").cast(Dec)).cast(Dec).as("dr"))
      .withColumn("batch_id", lit(batchId))
      .repartition(nBuckets, col("key")) // one appended file per bucket
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .insertInto(table)
  }

  /** The maintained result: Σdn, Σdr per key, after collapsing any
    * byte-identical replayed batch rows per (key, batch_id). Keys whose
    * count reaches 0 (fully deleted) drop out, matching what a
    * from-scratch recompute would produce. Zero exchanges: both
    * aggregation levels are satisfied by the table's bucket layout.
    *
    * The collapse FAILS LOUDLY on divergent duplicates: replay safety
    * rests on appends being deterministic functions of (key, batch_id),
    * so two DIFFERENT rows under one (key, batch_id) mean the
    * single-writer/deterministic-replay contract was violated — folding
    * them (e.g. independent per-column min, the first cut) would emit a
    * silently wrong total matching neither write. min/max agree ⇒ all
    * duplicates byte-identical; disagree ⇒ raise_error inside the same
    * zero-exchange aggregate.
    */
  def serve(spark: SparkSession, table: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    def one(lo: Column, hi: Column, what: String): Column =
      when(lo === hi, lo).otherwise(raise_error(concat(
        lit(s"IvmRollup: divergent replayed $what for key "), col("key").cast("string"),
        lit(" — different deltas appended under one batch_id"))))
    // `asOf = B` serves the rollup as it stood when delta B committed —
    // the stamped log is a version history (prefix sums of a changelog
    // are the changelog's prefix), valid back to the last compact,
    // which folds it to batch 0 and resets the horizon.
    spark.table(table)
      .filter(col("batch_id") <= asOf)
      .groupBy("key", "batch_id")
      .agg(min(col("dn")).as("dn_lo"), max(col("dn")).as("dn_hi"),
        min(col("dr")).as("dr_lo"), max(col("dr")).as("dr_hi"))
      .select(col("key"),
        one(col("dn_lo"), col("dn_hi"), "dn").as("dn"),
        one(col("dr_lo"), col("dr_hi"), "dr").as("dr"))
      .groupBy("key")
      .agg(sum(col("dn")).as("n"), sum(col("dr")).cast(Dec).as("total"))
      .filter(col("n") > 0)
  }

  /** DESCRIBE for the maintained rollup — the operational numbers an
    * operator reads before scheduling maintenance, derived from the
    * family's OWN log in one bounded pass (read cost ∝ log, never the
    * source tables):
    *
    *  - `live_keys` / `dead_keys`: keys whose net count is positive /
    *    has fallen to ≤ 0 (fully-deleted keys still occupying log rows
    *    — exactly what the next [[compact]] purges, the debt number);
    *  - `log_entries`: collapsed (key, batch_id) entries — the read
    *    amplification every [[serve]] pays over a compacted base. The
    *    REPLAY-COLLAPSED count, deliberately, like every read in the
    *    family: a crash-replayed batch's byte-identical duplicates
    *    don't inflate the self-report;
    *  - `batches_since_compact`: COUNT of distinct non-zero stamps in
    *    the log — a batch count, deliberately NOT max(stamp): stream
    *    feeds ([[graft.streaming.IvmStream]]) stamp monotonic epoch
    *    ids that skip empty epochs and never reset, so a max-based
    *    number would read "due" forever after the first compact and
    *    flap the maintenance loop; the distinct count is 0 right after
    *    any compact (the log folds to batch 0) whatever the stamps.
    *
    * The replay collapse applies [[serve]]'s loud-fence discipline to
    * the column it consumes (dn): divergent duplicates under one
    * (key, batch_id) are a contract violation, and DESCRIBE numbers
    * feed compaction decisions — a silently-wrong self-report is
    * exactly as bad here as a silently-wrong total there. All aggregates are null-safe on an
    * EMPTY log (a fully-deleted rollup compacts to zero rows): counts,
    * not sums of nothing.
    *
    * Plan shape: both groupBys sit on the table's key buckets (zero
    * exchanges), then one scalar fold; the batch-count side rides a
    * 1×1 crossJoin — the q198 DESCRIBE pattern.
    */
  def describe(spark: SparkSession, table: String): DataFrame = {
    val perKey = spark.table(table)
      .groupBy("key", "batch_id")
      .agg(min(col("dn")).as("dn_lo"), max(col("dn")).as("dn_hi"))
      .filter(assert_true(col("dn_lo") === col("dn_hi"),
        concat(lit("IvmRollup.describe: divergent replayed dn for key "),
          col("key").cast("string"),
          lit(" — different deltas appended under one batch_id"))).isNull)
      .groupBy("key").agg(sum(col("dn_lo")).as("n"), count(lit(1)).as("entries"))
    perKey.agg(
        count(when(col("n") > 0, 1L)).as("live_keys"),
        count(when(col("n") <= 0, 1L)).as("dead_keys"),
        coalesce(sum(col("entries")), lit(0L)).as("log_entries"))
      .crossJoin(spark.table(table)
        .agg(count_distinct(when(col("batch_id") =!= 0L, col("batch_id")))
          .as("batches_since_compact")))
  }

  /** DIFF between two served versions, computed WITHOUT serving either:
    * the net per-key (count, sum) change across the stamped slice
    * `from < batch_id <= to` — because the log IS a changelog, the
    * difference of two prefix sums is the slice between them. This is
    * the incremental-consumer verb: a downstream job that last read
    * version `from` asks "what changed?" and gets rows ∝ the
    * INTERVENING CHURN, never ∝ the rollup (serve(to) ⟕ serve(from)
    * would pay two full serves plus a key-wide join for the same
    * answer — at 100 TB that is the difference between reading a
    * day's deltas and re-scanning the view twice).
    *
    * Net-zero keys (churn that cancelled exactly within the window)
    * are dropped: the contract is "apply this changelog to serve(from)
    * and you hold serve(to)" (spec-pinned), and a zero row applies as
    * a no-op. Same loud divergence fence as [[serve]]; same horizon
    * contract as `asOf` — stamps are only comparable within a compact
    * generation (compact folds history to batch 0, so a pre-compact
    * `from` is unanswerable and the slice correctly reads empty).
    * Zero-exchange: both groupBys ride the key buckets.
    */
  def diff(spark: SparkSession, table: String, from: Long, to: Long): DataFrame = {
    require(0L <= from && from < to,
      s"IvmRollup.diff: need 0 <= from < to, got ($from, $to)")
    def one(lo: Column, hi: Column, what: String): Column =
      when(lo === hi, lo).otherwise(raise_error(concat(
        lit(s"IvmRollup.diff: divergent replayed $what for key "),
        col("key").cast("string"),
        lit(" — different deltas appended under one batch_id"))))
    spark.table(table)
      .filter(col("batch_id") > from && col("batch_id") <= to)
      .groupBy("key", "batch_id")
      .agg(min(col("dn")).as("dn_lo"), max(col("dn")).as("dn_hi"),
        min(col("dr")).as("dr_lo"), max(col("dr")).as("dr_hi"))
      .select(col("key"),
        one(col("dn_lo"), col("dn_hi"), "dn").as("dn"),
        one(col("dr_lo"), col("dr_hi"), "dr").as("dr"))
      .groupBy("key")
      .agg(sum(col("dn")).as("dn_delta"),
        sum(col("dr")).cast(Dec).as("dr_delta"))
      .filter(col("dn_delta") =!= 0L || col("dr_delta") =!= lit(0).cast(Dec))
  }

  /** Fold the delta log back into a single batch-0 base — same table,
    * same bucket layout, read cost back to one row per live key. The
    * fold is pinned (localCheckpoint) before the Overwrite because the
    * rewrite reads the table it replaces.
    */
  def compact(spark: SparkSession, table: String, path: String,
      nBuckets: Int = 16): Unit = {
    val folded = serve(spark, table)
      .select(col("key"), col("n").as("dn"), col("total").as("dr"),
        lit(0L).as("batch_id"))
      .localCheckpoint()
    // the markerless family's commit IS the whole-table Overwrite —
    // the lease-tenure fence sits immediately before it
    graft.core.CommitGuard.check()
    graft.sources.TableWriter.writeBucketed(folded, table, path, "key", nBuckets)
  }
}
