package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Kll

/** Incremental per-key metrics maintenance — the "metrics lake" pattern:
  * every ingest batch folds into a small per-key rollup table holding
  * EXACT counts/sums next to MERGEABLE sketches (KLL quantiles,
  * DataSketches HLL distincts via Spark's built-in `hll_sketch_agg`
  * family), so dashboards and drift monitors answer over any key set
  * from kilobyte rows — the raw 100 TB history is write-only.
  *
  * Everything here is chosen for merge algebra, not convenience:
  * count/decimal-sum add exactly; KLL and HLL merge with their stated
  * error bounds intact. That means `merge(build(A), build(B))` is
  * equivalent to `build(A ∪ B)` — exactly for the exact columns, within
  * sketch bounds for the sketched ones — under ANY batch slicing, which
  * is the property that makes per-day/per-source rollup rows composable
  * after the fact.
  */
object StatsRollup {

  /** Per-key rollup of one batch: exact row count and decimal-exact sum
    * of `value`, a KLL sketch of `value`'s distribution, and an HLL
    * sketch of `id` for distinct counting. One map-side-combined
    * aggregation; output is |keys| rows of O(kilobytes).
    */
  def build(df: DataFrame, key: Column, value: Column, id: Column,
      k: Int = 256): DataFrame =
    df.groupBy(key.as("key"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(value.cast(DecimalType(38, 6))).as("sum_value"),
        Kll.kllBuild(value.cast(DoubleType), k).as("value_sketch"),
        hll_sketch_agg(id).as("distinct_sketch"))

  /** Fold rollup tables (yesterday's stored rows + today's batch rollup)
    * into one: exact columns add, sketches merge. Same schema in, same
    * schema out — the result is storable and further mergeable.
    */
  def merge(rollups: DataFrame, k: Int = 256): DataFrame =
    rollups.groupBy("key")
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_value")).as("sum_value"),
        Kll.kllMerge(col("value_sketch"), k).as("value_sketch"),
        hll_union_agg(col("distinct_sketch")).as("distinct_sketch"))

  /** Human-readable report over a rollup: exact count/sum/mean, HLL
    * distinct estimate, and KLL quantiles. Per-row expressions only.
    */
  def report(rollup: DataFrame, qs: Seq[Double]): DataFrame =
    rollup.select(
      col("key"),
      col("n_rows"),
      col("sum_value").cast(DoubleType).as("sum_value"),
      (col("sum_value").cast(DoubleType) / col("n_rows").cast(DoubleType)).as("mean_value"),
      hll_sketch_estimate(col("distinct_sketch")).as("n_distinct_est"),
      Kll.kllSketchQuantiles(col("value_sketch"), qs).as("quantiles"))

  /** Corpus-wide (all keys folded) report — merge-then-report over the
    * stored rows alone; history is never rescanned.
    */
  def globalReport(rollup: DataFrame, qs: Seq[Double], k: Int = 256): DataFrame =
    report(merge(rollup.withColumn("key", lit("ALL")), k), qs)
}
