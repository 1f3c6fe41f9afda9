package graft.operators

import org.apache.spark.sql.SparkSession

/** The maintenance loop — turns the per-family lifecycle verbs from
  * operator-invoked calls into the policy-driven loop a production
  * deploy actually runs: read the family's DESCRIBE self-report
  * (bounded, cost ∝ log — never a corpus rescan), decide against a
  * [[CompactPolicy]], compact only when due.
  *
  * The decision inputs are exactly the two debt axes the DESCRIBE verbs
  * expose: how many batches of un-compacted log a serve must fold
  * (`batches_since_compact` — read amplification), and how much of the
  * log is DEAD weight a compact would purge (`dead_keys` on the rollup;
  * `view_log_entries − live_view_rows` on the join view). Compaction
  * correctness is the families' own theorem (q175/q195 prove compact ==
  * recompute); what the policy layer adds — and q213 hash-checks — is
  * that a POLICY-triggered compact is the same operation, not a
  * different code path.
  *
  * OPERATIONAL CONTRACT with streams: every compact requires
  * quiescence (the families' own documented rule), and for the FENCED
  * families (join view, pair/LSH/retrieval/positional/IVF indexes) a
  * compact also resets the stamp namespace to {0} — so a paused
  * checkpointed stream whose epoch counter kept its old value would
  * fail the writer fence on resume (its next stamp is epoch-derived,
  * not max+1). After compacting a stream-fed fenced table, restart the
  * stream from a FRESH checkpoint positioned at the source's current
  * offsets: epochs restart at 0, the first post-compact fold stamps 1
  * = max({0}) + 1, and the fence is satisfied. The markerless rollup
  * family has no fence and tolerates resumed epoch counters as-is
  * (which is why q213 drives the loop on it, and why
  * `batches_since_compact` is a distinct-stamp COUNT — a resumed
  * stream's stamps stay monotonic across the reset). The schedulable
  * loop without a stream restart is batch-fed maintenance; a future
  * epoch→stamp ledger in the markers would lift this, at the cost of
  * a marker schema change across all seven families.
  */
object Maintenance {

  /** `maxBatches`: compact when more than this many delta BATCHES have
    * accumulated since the last compact (serve-side read amplification
    * bound). The families report this as a distinct-stamp COUNT, never
    * max(stamp) — stream feeds stamp monotonic epoch ids that skip
    * empty epochs and survive compacts, so a max would mis-trigger
    * forever on any stream-fed table (and then re-trigger after every
    * compact: permanent flapping). `maxDeadFraction`: compact when more
    * than this fraction of the log's entries are dead weight
    * (space/scan bound). Either trigger suffices — the standard OR of
    * a time-like and a size-like threshold.
    */
  final case class CompactPolicy(maxBatches: Long = 16L,
      maxDeadFraction: Double = 0.2) {
    require(maxBatches >= 0L && maxDeadFraction >= 0.0 && maxDeadFraction <= 1.0,
      s"degenerate policy: maxBatches=$maxBatches maxDeadFraction=$maxDeadFraction")
  }

  private def due(batches: Long, dead: Long, total: Long,
      policy: CompactPolicy): Boolean =
    batches > policy.maxBatches ||
      (total > 0L && dead.toDouble / total > policy.maxDeadFraction)

  /** The rollup's compact decision, from one [[IvmRollup.describe]]
    * read: dead weight = keys whose net count fell to ≤ 0.
    */
  def shouldCompactRollup(spark: SparkSession, table: String,
      policy: CompactPolicy): Boolean = {
    val r = IvmRollup.describe(spark, table).head()
    due(r.getAs[Long]("batches_since_compact"), r.getAs[Long]("dead_keys"),
      r.getAs[Long]("live_keys") + r.getAs[Long]("dead_keys"), policy)
  }

  /** Read → decide → maybe compact; returns whether the compact ran
    * (so a scheduler can log/meter the loop). The read is the bounded
    * DESCRIBE; a not-due call touches nothing.
    */
  def compactRollupIfDue(spark: SparkSession, table: String, path: String,
      policy: CompactPolicy, nBuckets: Int = 16): Boolean = {
    val go = shouldCompactRollup(spark, table, policy)
    if (go) IvmRollup.compact(spark, table, path, nBuckets)
    go
  }

  /** The join view's compact decision, from one [[IvmJoin.describe]]
    * read: dead weight = collapsed view-log entries that net to
    * nothing servable (`view_log_entries − live_view_rows`).
    */
  def shouldCompactJoin(spark: SparkSession, table: String,
      policy: CompactPolicy): Boolean = {
    val r = IvmJoin.describe(spark, table).head()
    val entries = r.getAs[Long]("view_log_entries")
    due(r.getAs[Long]("batches_since_compact"),
      entries - r.getAs[Long]("live_view_rows"), entries, policy)
  }

  def compactJoinIfDue(spark: SparkSession, table: String, path: String,
      keys: Seq[String], policy: CompactPolicy,
      nBuckets: Int = 16): Boolean = {
    val go = shouldCompactJoin(spark, table, policy)
    if (go) IvmJoin.compact(spark, table, path, keys, nBuckets)
    go
  }

  /** The exact pair index's compact decision. Deliberately NOT
    * [[Dedup.pairIndexStats]] (whose live_pairs re-serves the whole
    * pair graph — an audit read, too heavy for a policy probe): the
    * probe reads only the two debt axes — max committed stamp from the
    * `_batches` marker, and the tombstone fraction over the collapsed
    * member set. Cost: one bounded marker collect + one distinct over
    * members/deleted — ∝ index, never corpus.
    *
    * The same two-axis policy fits every index family (each compact
    * purges its tombstones and resets its namespace); the pair index
    * gets the verb because it is the tier's flagship — the others
    * follow the identical shape when a deployment needs them.
    */
  def shouldCompactPairs(spark: SparkSession, table: String,
      policy: CompactPolicy): Boolean = {
    import org.apache.spark.sql.functions.{col, count_distinct, when}
    // the batches axis first — a distinct DATA-BEARING stamp count
    // over the members log, the [[IvmRollup.describe]] rationale twice
    // over: epoch-derived stream stamps rule out max(), and the
    // MARKER rules itself out because streams stamp empty epochs for
    // fence contiguity — a quiet stream's markers are zero fold-able
    // debt. (Delete batches append no members; their debt is the dead
    // axis below.) When this axis alone decides, the probe never pays
    // the tombstone scans.
    val batches = spark.table(s"${table}_members")
      .agg(count_distinct(when(col("batch_id") =!= 0L, col("batch_id"))))
      .head().getLong(0)
    if (batches > policy.maxBatches) return true
    val dead =
      if (spark.catalog.tableExists(s"${table}_deleted"))
        spark.table(s"${table}_deleted").select("id").distinct().count()
      else 0L
    if (dead == 0L) return false // no tombstones → nothing to purge
    // fraction base = distinct indexed ids; a tombstone aimed at a
    // never-indexed id (legal, it just never matches) can push the
    // fraction past 1 — which still reads as "compact", the only
    // sensible answer for a ledger dominated by dead weight
    val total = spark.table(s"${table}_members")
      .select("id").distinct().count() // replay duplicates collapse
    due(batches, dead, total, policy)
  }

  def compactPairsIfDue(spark: SparkSession, table: String, path: String,
      policy: CompactPolicy, nBuckets: Int = 8): Boolean = {
    val go = shouldCompactPairs(spark, table, policy)
    if (go) Dedup.compactPairIndex(spark, table, path, nBuckets)
    go
  }
}
