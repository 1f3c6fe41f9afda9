package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Mixture construction ("30% of the English web crawl, all of the rare
  * languages") needs sampling that is (a) reproducible run-to-run, (b)
  * stable under re-partitioning and retries, and (c) a pure narrow filter
  * with no shuffle — `df.sample()` is none of these (it draws from a
  * per-partition RNG whose output changes with the split layout). The
  * standard fix is a hash gate: a record is kept iff a salted hash of its
  * stable key lands under the stratum's rate. Membership is then a
  * property of the KEY, so reruns, retries, and different cluster sizes
  * select the identical sample — and adding a stratum never disturbs the
  * records sampled for another (per-stratum rates only move their own
  * gate).
  *
  * The hash is the first 8 hex chars of md5 (plain SQL on any engine, so
  * the whole selection is oracle-checkable) — uniform enough that bucket
  * skew is < 0.5% at 1M keys; the salt decorrelates this gate from every
  * other md5 use in a pipeline.
  */
object Sampling {

  /** Integer parse of the first `chars` md5-hex chars of `salt:key` — the
    * one salted-hash idiom both sampling modes build on (its SQL twin is
    * [[hexPrefixHashSql]]; keep the two in lockstep). NULL keys propagate
    * to NULL (`concat`, like SQL `||`).
    */
  private[operators] def hexPrefixHash(key: Column, salt: String, chars: Int): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, chars), 16, 10)
      .cast("long")

  /** SQL twin of [[hexPrefixHash]] for DuckDB (same NULL propagation). */
  private[operators] def hexPrefixHashSql(keyExpr: String, salt: String, chars: Int): String = {
    val quoted = salt.replace("'", "''")
    s"CAST(('0x' || substring(md5('$quoted' || ':' || CAST($keyExpr AS VARCHAR)), 1, $chars)) AS BIGINT)"
  }

  /** Deterministic bucket in [0, 100) from a stable key: parse the first
    * 8 md5-hex chars of `salt:key` as an integer, mod 100. A NULL key
    * yields a NULL bucket (`concat` propagates it, like the SQL twin's
    * `||`), so NULL-keyed rows fail every `bucket < rate` gate and are
    * excluded from all samples — a sampling key is an identity and a NULL
    * identity has no stable membership.
    */
  def hashBucket(key: Column, salt: String = "graft"): Column =
    hexPrefixHash(key, salt, 8) % 100

  /** SQL twin of [[hashBucket]] for DuckDB (same NULL propagation). */
  def hashBucketSql(keyExpr: String, salt: String = "graft"): String =
    s"${hexPrefixHashSql(keyExpr, salt, 8)} % 100"

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-hashing answer to "we need more shards": each key goes
    * to the shard with the highest 48-bit md5 weight over (salt, shard,
    * key). Growing n → n+k reassigns ONLY the keys whose new argmax
    * lands in a new shard (expected k/(n+k) of them, the information-
    * theoretic minimum), because shards [0, n) keep their exact weights:
    * a key whose winner is still < n provably does not move. A plain
    * `hash % n` resize moves (n−1)/n of the corpus — at 100 TB the
    * difference is rewriting an eighth of the lake vs almost all of it.
    *
    * Pure per-row expression work (n md5 evaluations folded in-row via
    * `greatest` over (weight, shard) structs — no explode, no shuffle,
    * no state), deterministic across reruns/partitionings like every
    * engine sampler, and SQL-expressible, so rebalance plans are
    * oracle-checkable. Ties (2⁻⁴⁸ per pair) break to the higher shard
    * id on both engines.
    */
  def rendezvousShard(key: Column, nShards: Int, salt: String = "hrw"): Column =
    greatest((0 until nShards).map { s =>
      struct(hexPrefixHash(key, s"$salt:$s", 12).as("w"), lit(s).as("s"))
    }: _*).getField("s")

  /** Stratified deterministic sample: keep a row iff its hash bucket is
    * below the sampling percentage of its stratum (`rates` in percent,
    * missing strata fall back to `defaultPct`). Appends the bucket as
    * `sample_bucket` so downstream stages can sub-sample consistently
    * (bucket < 10 is always a subset of bucket < 30).
    *
    * Scale: narrow projection + filter only — no shuffle, no state; the
    * rate table is folded into the expression (strata counts are small by
    * definition). Pushes down past column pruning like any filter.
    */
  def stratifiedHash(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Int],
      defaultPct: Int,
      salt: String = "graft"): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 100) &&
      defaultPct >= 0 && defaultPct <= 100, "rates are percentages in [0, 100]")
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (value, pct)) =>
      when(stratum === value, lit(pct)).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(key, salt))
      .filter(col("sample_bucket") < rate)
  }

  /** Exactly-k-per-stratum deterministic sample: rank each stratum's rows
    * by a 60-bit salted key hash (key as tie-break) and keep the first k.
    * Like the rate gate, membership is a pure function of the keys —
    * reruns and re-partitioning select the identical rows — but the exact
    * count costs one shuffle (a window partitioned by stratum).
    *
    * Scale note: a very hot stratum funnels through one window task. When
    * strata are huge and k is small, pre-thin with the rate gate first
    * (`stratifiedHash(..., rates = pct ≫ k/|stratum|)` then this) — the
    * gate is shuffle-free and hash-consistent with this ranking's salt
    * ONLY if different salts are used, so keep the default distinct salt
    * per stage.
    *
    * @return input rows + `sample_rank` (1-based within stratum), rank <= k
    */
  def fixedPerStratum(
      df: DataFrame,
      key: Column,
      stratum: Column,
      k: Int,
      salt: String = "graft-k"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // NULL keys are excluded outright (same rule as the rate gate's NULL
    // bucket): a NULL hash would rank FIRST under Spark's ASC (nulls
    // first) but LAST under SQL ASC (nulls last), silently occupying a
    // sample slot on one engine only.
    // 15 hex chars = 60 bits: fits a signed long on both engines.
    val hv = hexPrefixHash(key, salt, 15)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hv.asc, key.asc)
    df.where(key.isNotNull)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** SQL twin of [[fixedPerStratum]]'s ranking hash (add `WHERE key IS
    * NOT NULL` to mirror the NULL-key exclusion).
    */
  def rankHashSql(keyExpr: String, salt: String = "graft-k"): String =
    hexPrefixHashSql(keyExpr, salt, 15)

  /** Deterministic weighted sample WITHOUT replacement, top-k by the
    * exponential race (Efraimidis–Spirakis 2006): each row draws
    * t = −ln(u)/w from its salted-hash uniform u and the k smallest t win
    * — inclusion probability proportional to weight, membership a pure
    * function of (key, weight, salt). u = (h60 + 1)/2⁶⁰ ∈ (0, 1], so ln
    * is finite; rows with weight <= 0 or NULL keys are excluded (no
    * stable membership). One narrow projection + one distributed
    * sort-limit — no window over the full input (q76 rule), no shuffle
    * beyond the top-k reduction, which is exactly how the 100 TB variant
    * runs (per-partition top-k then merge).
    *
    * @return the k winners + `race_t` (the sort key) + `sample_rank`
    */
  def weightedTopK(
      df: DataFrame,
      key: Column,
      weight: Column,
      k: Int,
      salt: String = "graft-w"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (hexPrefixHash(key, salt, 15).cast("double") + lit(1.0)) /
      lit(1152921504606846976.0) // 2^60
    val t = -log(u) / weight.cast("double")
    val ranked = df
      .where(key.isNotNull && weight.cast("double") > 0.0)
      .withColumn("race_t", t)
      .orderBy(col("race_t").asc, key.asc)
      .limit(k)
    ranked.withColumn("sample_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("race_t").asc, key.asc)))
  }

  /** SQL twin of [[weightedTopK]]'s race key (same u construction; add
    * the weight > 0 / key NOT NULL guards and the (race_t, key) order).
    */
  def raceKeySql(keyExpr: String, weightExpr: String, salt: String = "graft-w"): String =
    s"-ln((CAST(${hexPrefixHashSql(keyExpr, salt, 15)} AS DOUBLE) + 1.0) " +
      s"/ 1152921504606846976.0) / CAST($weightExpr AS DOUBLE)"

  /** floor(F(k)·2³²) for F the Poisson(1) CDF, k = 0..7 — INTEGER
    * thresholds computed once here and rendered into both engines, so
    * the multiplicity draw is pure integer comparison (no float CDF on
    * either side; the shared literals are the cross-engine contract).
    * Mass beyond k = 7 (< 1e-5) rounds into multiplicity 8.
    */
  private[graft] val poissonCdf32: Seq[Long] = {
    val e = math.exp(-1.0)
    val cum = (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + e / (1 to k).map(_.toDouble).product.max(1.0)
    }.tail // F(0)..F(7)
    cum.map(f => (f * 4294967296.0).toLong)
  }

  /** Deterministic Poisson(1) bootstrap multiplicity of `key` in replica
    * `replica`: the 32-bit salted hash of (replica, key) inverted
    * through the integer CDF thresholds [[poissonCdf32]]. The Poisson
    * bootstrap (each row enters each replica an independent Poisson(1)
    * number of times) is THE resampling scheme that distributes: no
    * per-replica global rank or fixed-n draw — multiplicity is a pure
    * per-row function, so B replicas cost one B-way spine join, and a
    * crashed/rerun/re-partitioned job draws identical replicas.
    */
  def poissonMultiplicity(key: Column, replica: Column,
      salt: String = "boot"): Column = {
    val h = hexPrefixHash(concat(replica.cast("string"), lit("|"), key.cast("string")),
      salt, 8)
    poissonCdf32.zipWithIndex.foldRight(lit(8): Column) {
      case ((t, k), acc) => when(h < t, k).otherwise(acc)
    }
  }

  /** SQL twin of [[poissonMultiplicity]] — same hash, same integer
    * thresholds, same first-wins CASE order.
    */
  def poissonMultiplicitySql(keyExpr: String, replicaExpr: String,
      salt: String = "boot"): String = {
    val h = hexPrefixHashSql(
      s"CAST($replicaExpr AS VARCHAR) || '|' || CAST($keyExpr AS VARCHAR)", salt, 8)
    val whens = poissonCdf32.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }.mkString(" ")
    s"CASE $whens ELSE 8 END"
  }
}
