package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** The 1-based global ROW_NUMBER under `sortCols` WITHOUT a one-task
    * window: range-repartition on the sort key (every partition owns a
    * contiguous key range, partitions ordered), sort within partitions,
    * then `zipWithIndex` (one count per partition to the driver, indexes
    * assigned in parallel). `sortCols` must be a TOTAL order (include
    * the id tie-break) — then the ranks are bit-identical to
    * `ROW_NUMBER() OVER (ORDER BY sortCols)` regardless of where the
    * range sampler happens to place partition bounds, because the rank
    * depends only on the order, not the cuts. Since round 10 this IS
    * the executed path of the eval arc (q157 ranks, q164 bins via
    * [[ntileOfRank]]); the one-task window formulation survives as
    * q171's in-engine twin, driver-checked bit-identical every round.
    *
    * @return the input columns + `global_rank` (1-based long)
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    require(sortCols.nonEmpty)
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val withRank = sorted.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withRank,
      sorted.schema.add("global_rank", LongType, nullable = false))
  }

  /** Global INCLUSIVE running sums of long columns under `sortCols`
    * WITHOUT a one-task window — the [[graft.operators.Packing]]
    * two-pass scan generalized to arbitrary sort keys and multiple
    * accumulators: range-repartition + in-partition sort, pinned
    * (localCheckpoint — both passes must see one layout, and an
    * eviction-recompute would re-draw range bounds SILENTLY), pass 1
    * collects one subtotal vector per partition (bounded metadata),
    * pass 2 adds each partition's base offsets in a partition-local
    * scan. `sortCols` must be a total order for the sums to be
    * well-defined per row; `valueCols` must be non-null LongType.
    * Bit-identical to `sum(c) OVER (ORDER BY sortCols ROWS UNBOUNDED
    * PRECEDING)` — integer addition is associative, so the numbers
    * don't depend on where the range sampler cuts partitions.
    *
    * @return the input columns + `<valueCol>_cum` (inclusive, long)
    */
  def globalRunningSums(df: DataFrame, sortCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    require(sortCols.nonEmpty && valueCols.nonEmpty)
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val idx = valueCols.map(sorted.schema.fieldIndex)
    val rdd = sorted.rdd
    // pass 1: one long vector per partition to the driver
    val partTotals = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val s = new Array[Long](idx.length)
      it.foreach(r => idx.indices.foreach(i => s(i) += r.getLong(idx(i))))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val bases = spark.sparkContext.broadcast(
      partTotals.scanLeft(new Array[Long](idx.length)) { (acc, t) =>
        Array.tabulate(idx.length)(i => acc(i) + t(i))
      })
    // pass 2: partition-local running sums on top of the base offsets
    val withCum = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val run = bases.value(pid).clone()
      it.map { r =>
        idx.indices.foreach(i => run(i) += r.getLong(idx(i)))
        Row.fromSeq(r.toSeq ++ run.toList) // toList copies the mutable run
      }
    }
    spark.createDataFrame(withCum,
      valueCols.foldLeft(sorted.schema)((s, c) =>
        s.add(s"${c}_cum", LongType, nullable = false)))
  }

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
