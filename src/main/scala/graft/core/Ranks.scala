package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rank arithmetic for the distributed-sort-instead-of-global-window
  * idiom: once rows carry a 1-based global rank (range-partitioned sort +
  * `zipWithIndex` — see q12 / ExecutiveDedupPipeline / Dedup's
  * vocabulary), quantile-bucket assignment is per-row arithmetic, and the
  * one-task window NTILE needs is gone.
  */
object Ranks {

  /** SQL NTILE(k)'s bucket for 1-based rank `r` of `n` rows: the first
    * n mod k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — NTILE's exact
    * remainder-spreading contract, so grouping by this column is
    * bit-identical to grouping by `ntile(k) over (order by ...)` on the
    * same total order. `n` and `k` are plan constants (n is typically one
    * measured driver long); only `r` is per-row.
    */
  def ntileOfRank(r: Column, n: Long, k: Int): Column = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val q = n / k
    val m = n % k
    val cut = m * (q + 1) // ranks <= cut fall in the ⌈n/k⌉-sized buckets
    // exact long floor-division (Packing's discipline): subtract the
    // remainder first so the double division is a whole number — the
    // bit-identical-to-NTILE promise holds by construction, not by
    // double-rounding luck, at any n·k
    def fdiv(c: Column, d: Long): Column = (c - c % d) / d
    // q == 0 (fewer rows than buckets) makes the otherwise-branch
    // unreachable (cut == n bounds every rank); the max(q,1) keeps the
    // unevaluated branch free of a divide-by-zero all the same
    when(r <= cut, fdiv(r - 1, q + 1) + 1)
      .otherwise(lit(m) + fdiv(r - 1 - cut, math.max(q, 1L)) + 1)
      .cast("int")
  }
}
