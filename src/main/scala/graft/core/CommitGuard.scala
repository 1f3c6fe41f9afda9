package graft.core

/** The compact COMMIT-POINT fencing seam (round-11 verdict #1).
  *
  * The compact lease ([[graft.operators.Maintenance.acquireLease]])
  * makes the single-writer assumption enforceable across schedulers —
  * but TTL expiry alone recreates the tear for a holder that is merely
  * SLOW: A's lease expires mid-compact, B claims it and compacts, and
  * A's still-running compact commits its marker over B's. The classic
  * fix is a fencing token: every lease tenure carries a monotonic
  * generation, and the write that COMMITS the compact (the marker-last
  * rewrite — every family funnels through exactly one such site)
  * re-checks that the family's lease still belongs to this tenure. A
  * superseded holder's late commit then refuses loudly instead of
  * tearing the new owner's write set.
  *
  * This object is the seam between the two layers: the lease bracket
  * ([[graft.operators.Maintenance.withLease]] / `sweep`) installs the
  * tenure check for the dynamic extent of its body, and every family
  * compact calls [[check]] immediately before its marker commit (the
  * markerless rollup: before its whole-table Overwrite, which IS its
  * commit). Unbracketed manual compacts — the single-writer "manual
  * ladder" every round's fixtures drive — see no guard and pay nothing:
  * [[check]] is one thread-local read when no bracket is active.
  *
  * A DynamicVariable (inheritable thread-local), not a global: two
  * families compacting on different scheduler threads in one JVM each
  * see only their own tenure's check, and the concurrent per-table
  * rewrite futures inside a compact don't race the guard — the marker
  * commit, and therefore [[check]], runs on the bracket's own thread
  * after every data rewrite joins.
  */
object CommitGuard {

  private val guard =
    new scala.util.DynamicVariable[Option[() => Unit]](None)

  /** Run `body` with `tenureCheck` installed as the commit-point guard.
    * Nested brackets see the innermost guard — the lease bracket is
    * per-family, so the innermost is the one that owns the commit.
    */
  def withGuard[A](tenureCheck: () => Unit)(body: => A): A =
    guard.withValue(Some(tenureCheck))(body)

  /** The commit-point check. Family compacts call this immediately
    * before their marker rewrite; outside any bracket it is a no-op.
    * Throws (from the installed check) when the caller's lease tenure
    * has been superseded — the compact must abort BEFORE the marker,
    * leaving the family serving the new owner's (or the pre-compact)
    * state, never a torn mix.
    */
  def check(): Unit = guard.value.foreach(_.apply())
}
