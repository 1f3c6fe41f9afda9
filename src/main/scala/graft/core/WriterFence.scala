package graft.core

/** The out-of-sequence writer fence, shared by every maintained-state
  * family (the [[graft.operators.IvmJoin.applyDelta]] idiom made
  * uniform — round-7 verdict): batch stamps commit in SEQUENCE, so a
  * second writer racing ahead with a fresh id fails loudly here instead
  * of silently violating the single-writer contract (for families whose
  * appends read pre-state, an interleaved writer would corrupt the
  * pre-state reads; for pure-function appends it would double-index
  * documents under two different stamps, which no read-side collapse
  * can fold). A crashed batch's replay passes: its marker never landed,
  * so max(committed) + 1 is still its own id. Callers no-op committed
  * replays BEFORE this fence.
  *
  * COMPAT NOTE (round-8 behavior change): the fence requires a
  * CONTIGUOUS ledger. Pre-fence indexes written with sparse-but-unique
  * stamps — or stream checkpoints whose empty epochs skipped stamping —
  * will fail the fence on their next extend. The migration is one
  * compact: every family's compact folds the log to batch 0 and resets
  * the stamp namespace, after which extends resume at 1. The error
  * message says so, so the operator's next move is in the failure.
  */
object WriterFence {

  /** The stamps a compact's marker rewrite keeps BEYOND the batch-0
    * base: empty for the default full namespace reset, or the max
    * committed stamp under the NAMESPACE-PRESERVING mode (the round-9
    * PLANS.md "epoch→stamp ledger" lift, option 1) — the marker becomes
    * {0, maxCommitted}, so a stopped-but-checkpointed stream resumes
    * over the compacted family: its next epoch-derived stamp is
    * maxCommitted + 1 and passes [[apply]], and a re-delivery of its
    * LAST committed epoch (the only one foreachBatch can replay) no-ops
    * on the preserved stamp. Interior stamps (1..max−1) are forgotten
    * deliberately: no replay of them can arrive from the single
    * checkpoint that owns the index, and a MANUAL replay of one now
    * fails the fence loudly instead of re-applying as a fresh batch.
    * A never-extended family (max == 0) preserves nothing — both modes
    * write exactly {0}.
    */
  def compactKeepStamps(committed: Set[Long], preserve: Boolean): Seq[Long] =
    if (preserve && committed.nonEmpty) Seq(committed.max).filter(_ > 0L)
    else Seq.empty

  def apply(committed: Set[Long], batchId: Long, family: String): Unit = {
    // an existing-but-empty marker is a recoverable crash artifact
    // (e.g. death mid-Overwrite of the marker file), not a sequencing
    // bug — name it instead of throwing a bare empty.max
    require(committed.nonEmpty,
      s"$family: empty commit ledger — the _batches marker exists but " +
        "holds no stamps (crash mid-overwrite of the marker?); rebuild " +
        "the index or repair the marker table")
    val maxCommitted = committed.max // every build commits stamp 0
    require(batchId == maxCommitted + 1,
      s"$family: batch $batchId applied out of sequence (last committed " +
        s"$maxCommitted) — interleaved writers break the single-writer " +
        "contract; one writer owns one index. If this ledger predates " +
        "the fence (sparse stamps / skipped empty epochs), one compact " +
        "migrates it: compact resets the stamp namespace to 0")
  }
}
