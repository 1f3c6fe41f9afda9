package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning: shrink the PROBE side of an equi-join
  * before its shuffle by testing each key against a Bloom filter built
  * from the BUILD side.
  *
  * This is the join-size regime broadcast can't reach: a build side of
  * 10⁶–10⁸ keys is far past any sane `broadcast()` hint (a hash relation
  * of 100M longs is gigabytes), but its Bloom filter is megabytes — 1M
  * keys at 1% fpp is ~1.2 MB — and rides to every executor as a plan
  * constant. With a selective build side the probe's shuffle write drops
  * by orders of magnitude, which at 100 TB is the difference between a
  * join that runs and one that doesn't. False positives cost only wasted
  * shuffle rows — the join itself removes them, so the RESULT is exactly
  * the plain join's (which is how the q101 oracle checks this).
  *
  * Spark's AQE injects the same trick automatically ("runtime row-level
  * filtering") but only under conf-gated heuristics on shuffle-stage
  * statistics; this operator is the explicit, always-on form, built from
  * the SAME Catalyst machinery ([[BloomFilterAggregate]] on the build
  * side, [[BloomFilterMightContain]] on the probe) so build-put and
  * probe-test hashing agree by construction (both `xxhash64(key)`), and
  * any key type xxhash64 accepts works unmodified.
  *
  * Sizing is measured, not guessed: one count job on the build side picks
  * `expectedItems`, and the bit width follows the textbook
  * m = −n·ln(p)/ln²2, clamped to Spark's runtime-filter ceiling
  * (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits`) — past the
  * clamp the fpp degrades gracefully and correctness is unaffected.
  */
object BloomPrune {

  /** Aggregate column building a Bloom filter (binary) over `key`. */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems = conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    val n = expectedItems.max(1L).min(maxItems)
    val bits = math.ceil(-n * math.log(fpp) / (math.log(2.0) * math.log(2.0)))
      .toLong.max(64L).min(maxBits)
    ColumnBridge.column(new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(key))),
        Literal(n), Literal(bits))
      .toAggregateExpression())
  }

  /** Probe-side membership test against a built filter's bytes. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** `probe` rows whose `probeKey` might match a `buildKey` — a superset
    * of the exact semi-join bounded by fpp. Two bounded driver actions:
    * the build-side count (one long) and the filter bytes themselves.
    * An empty build side short-circuits to an empty (but same-schema)
    * probe: no keys can match, and a 0-item filter is degenerate.
    */
  def prune(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column, fpp: Double = 0.01): DataFrame = {
    val n = build.count()
    if (n == 0) return probe.filter(lit(false))
    val row = build.agg(bloomAgg(buildKey, n, fpp).as("__bf")).head()
    val bytes = row.getAs[Array[Byte]]("__bf")
    probe.filter(mightContain(bytes, probeKey))
  }

  /** Bloom-pruned inner equi-join: result identical to
    * `probe.join(build, probeKey === buildKey)`, shuffle sized by the
    * pruned probe. Column names must be distinct across the two sides
    * (the usual equi-join contract here).
    */
  def prunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, fpp: Double = 0.01): DataFrame =
    prune(probe, col(probeKey), build, col(buildKey), fpp)
      .join(build, col(probeKey) === col(buildKey))
}
