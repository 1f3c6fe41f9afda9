package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted index for the retrieval family — the "hash once at
  * ingest" story (the near-dup index pair, `Dedup.buildNearDupIndex`)
  * applied to keyword search: q87/q88/q145 tokenize the corpus per
  * query, which is the right shape for one-off analytics but not for a
  * corpus that is queried repeatedly — at 100 TB the tokenize+explode
  * scan IS the cost. This operator pays it once:
  *
  *  - [[build]] writes the posting list (doc_id, term, tf) as a
  *    TERM-BUCKETED table ([[graft.sources.TableWriter.writeBucketed]]):
  *    every query's `term IN (...)` probe prunes to the buckets holding
  *    its query terms and reads them pre-shuffled — no corpus scan, no
  *    exchange, per-query cost ∝ matched postings.
  *  - [[extend]] appends a new batch's postings through the table's
  *    existing bucket spec (`insertInto`), so increments stay
  *    co-located and cost ∝ batch, never ∝ history. Callers own the
  *    "each document indexed once" contract, same as the near-dup
  *    index.
  *  - corpus cardinality (the ranking's N) lives in a `_meta` side
  *    table as one row PER BATCH; readers sum it — append-only
  *    increments need no read-modify-write.
  *
  * [[topK]] and [[boolean]] evaluate the q88 / q87 contracts from the
  * index: identical integer-exact scoring (BM25-shaped rational idf as
  * a scaled BIGINT — see q88's derivation), identical tokenization rule
  * (lowercased whitespace split, the retrieval family's shared
  * convention), so index-served results match the scan-time queries
  * row-for-row (RetrievalIndexSpec pins both, plus incremental ==
  * from-scratch).
  */
object RetrievalIndex {

  // tokenization, query-term frame, and idf scale are SHARED with the
  // scan-time queries (CurationOps q87/q88) — one definition, so the
  // "index-served == scan-time, row for row" contract cannot drift
  private def postings(docs: DataFrame): DataFrame =
    graft.queries.CurationOps.postings(docs)
  private def queryTermsDf(spark: SparkSession, qs: Seq[(Int, Seq[String])]): DataFrame =
    graft.queries.CurationOps.queryTermsDf(spark, qs)
  private def idfScale: Long = graft.queries.CurationOps.idfScale

  private val bucketedScanLock = new Object

  /** Run `f` with auto-bucketed-scan selection off (scoped set/restore,
    * the Tables.events idiom). Spark's `DisableUnnecessaryBucketedScan`
    * reverts to a plain file scan when no downstream operator needs the
    * bucket distribution — but a SELECTIVE probe's win is bucket
    * PRUNING on the filter itself (`SelectedBucketsCount: k out of n`,
    * skipping every file of every non-matching bucket), which only
    * happens on the bucketed read path. The probe jobs here are exactly
    * that shape, so they opt out of the auto-disable for their own
    * planning; the session value is restored for everyone else.
    *
    * The read/set/restore runs under a JVM-wide lock: two interleaved
    * scopes would otherwise capture each other's transient `false` as
    * "prior" and leave the session flag off permanently. (A query
    * planned by an UNRELATED thread during the scope still sees the
    * transient value — the inherent blast radius of session-scoped
    * conf; probes hold the scope only across their own tiny-plan
    * materialization.)
    */
  private[graft] def withBucketedScan[T](spark: SparkSession)(f: => T): T =
    bucketedScanLock.synchronized {
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "false")
      try f
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

  /** Write order is the crash contract: postings first, `_meta` LAST as
    * the commit marker — [[RetrievalStream]] (and any caller probing for
    * an existing index) checks `_meta`, so a crash between the two
    * writes reads as "no index yet" and the next build safely overwrites
    * the orphaned postings instead of extending a half-built pair.
    *
    * `docs` is pinned once: postings and the cardinality row must see
    * the same snapshot, and the corpus scan is paid once, not twice.
    */
  def build(docs: DataFrame, table: String, path: String, nBuckets: Int = 16): Unit = {
    val d = docs.localCheckpoint()
    graft.sources.TableWriter.writeBucketed(
      postings(d), s"${table}_postings", s"$path/postings", "term", nBuckets)
    val spark = d.sparkSession
    import spark.implicits._
    Seq(d.count()).toDF("n_docs")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("path", s"$path/meta").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** Same ordering contract as [[build]]: postings append first, meta
    * append last. A crash between them under-counts N until the batch
    * replays; a replayed batch appends both again — the documented
    * foreachBatch idempotence caveat (stamp appends with the batch id
    * in production).
    */
  def extend(docs: DataFrame, table: String): Unit = {
    val d = docs.localCheckpoint()
    postings(d)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .insertInto(s"${table}_postings")
    val spark = d.sparkSession
    import spark.implicits._
    Seq(d.count()).toDF("n_docs")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .insertInto(s"${table}_meta")
  }

  /** q88 from the index: top-k docs per query by Σ tf·idf_scaled, ranked
    * under the (score desc, doc_id asc) total order. The postings scan
    * is bucket-pruned by the broadcast-joined query terms' `term IN`
    * pushdown; df and scores aggregate only matched postings.
    */
  def topK(spark: SparkSession, table: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10): DataFrame = {
    val n = spark.table(s"${table}_meta")
      .agg(sum(col("n_docs"))).head.getLong(0)
    val terms = queries.flatMap(_._2).distinct
    val p = spark.table(s"${table}_postings")
      .filter(col("term").isin(terms: _*)) // explicit IN → bucket pruning
    val q = broadcast(queryTermsDf(spark, queries))
    // feeds df agg + scoring; materialized UNDER the bucketed-scan scope
    // so the probe job actually prunes to the query terms' buckets
    val matched = withBucketedScan(spark) { p.join(q, "term").localCheckpoint() }
    val dfT = matched.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
      .withColumn("idf_scaled",
        expr(s"((2 * (${n}L - df) + 1) * ${idfScale}L) div (2 * df + 1)"))
    val scored = matched.join(broadcast(dfT.select("term", "idf_scaled")), "term")
      .groupBy("qid", "doc_id")
      .agg(sum(col("tf") * col("idf_scaled")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "rank")
  }

  /** q87 from the index: docs containing ALL of each query's terms. */
  def boolean(spark: SparkSession, table: String,
      queries: Seq[(Int, Seq[String])]): DataFrame = {
    val terms = queries.flatMap(_._2).distinct
    val p = spark.table(s"${table}_postings")
      .filter(col("term").isin(terms: _*))
    val q = broadcast(queryTermsDf(spark, queries))
    val arity = queries.foldLeft(lit(-1)) { case (acc, (qid, ts)) =>
      when(col("qid") === qid, lit(ts.size)).otherwise(acc)
    }
    val matched = withBucketedScan(spark) { p.join(q, "term").localCheckpoint() }
    matched
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") === arity)
      .select("qid", "doc_id", "n_matched")
  }
}
