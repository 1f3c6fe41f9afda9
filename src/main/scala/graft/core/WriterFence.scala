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
  */
object WriterFence {
  def apply(committed: Set[Long], batchId: Long, family: String): Unit = {
    val maxCommitted = committed.max // every build commits stamp 0
    require(batchId == maxCommitted + 1,
      s"$family: batch $batchId applied out of sequence (last committed " +
        s"$maxCommitted) — interleaved writers break the single-writer " +
        "contract; one writer owns one index")
  }
}
