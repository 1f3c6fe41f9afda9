package graft.core

/** Concurrent independent Spark actions (optimization guide §2.6,
  * "overlap independent jobs"): a metadata-tier verb that runs N
  * independent per-table jobs SEQUENTIALLY pays N × (planning +
  * scheduling + commit round-trips) of driver latency — measured at
  * 60–120 ms per action in this environment even for KB-sized tables,
  * which dominates the snapshot/maintenance ladders. Running them from
  * a small pool overlaps those fixed latencies while Spark's scheduler
  * interleaves the (tiny) task sets; at 100 TB the same overlap
  * back-fills executors freed by one table's write tail with the next
  * table's tasks.
  *
  * The house precedent is [[graft.operators.IvmJoin]]'s concurrent
  * three-log build/compact (Future + Await over the global pool); this
  * helper just names the move and PRESERVES INPUT ORDER in the result,
  * so manifest/report assembly downstream is byte-identical to the
  * sequential code. Failure semantics: the first failing item's
  * exception propagates (as with a sequential loop, though when several
  * items fail concurrently which one surfaces is not ordered — callers
  * that stage per-table races deterministically, e.g. via
  * [[graft.operators.Snapshot.onTableExported]], should fall back to a
  * sequential loop).
  */
object Par {

  def run[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.sizeIs <= 1) items.map(f)
    else {
      import scala.concurrent._
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(Future.sequence(items.map(a => Future(f(a)))),
        duration.Duration.Inf)
    }
}
