package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: watermarked windowed aggregation and
  * stateful sessionization. Batch twins live in `graft.queries` (q10
  * hourly rollup, q51 sessionization) — same semantics, so results are
  * cross-checkable against the DuckDB oracle while the streaming variants
  * are exercised with MemoryStream in StreamingSpec.
  */
object EventStreams {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double)

  /** Open-session state for [[sessionize]] (top-level for Encoder derivation). */
  final case class Open(start: Long, last: Long, n: Long, sum: Double)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming twin of q10_events_hourly (append-mode safe).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream a result into a [[graft.sources.KeyValueSink]] — the streaming
    * twin of the batch sink: one idempotent put per key per micro-batch,
    * opened per partition (`ForeachWriter`), safe under task retries.
    *
    * Serialization happens UPSTREAM with Spark's `to_json` (same path as
    * the batch sink — hand-rolled JSON escaping is a bug farm); use
    * [[toKeyedJson]] to shape the stream, then `.foreach(kvSinkWriter(...))`.
    */
  def toKeyedJson(df: DataFrame, keyCol: String): DataFrame = {
    val payload = df.columns.filterNot(_ == keyCol)
    df.select(
      col(keyCol).cast("string").as("key"),
      // explicit nulls: a document store distinguishes "clear this field"
      // (null) from "leave unchanged" (absent)
      to_json(struct(payload.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("doc"))
  }

  def kvSinkWriter(mkSink: () => graft.sources.KeyValueSink)
      : org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] =
    new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
      @transient private var sink: graft.sources.KeyValueSink = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        sink = mkSink()
        true
      }
      override def process(row: org.apache.spark.sql.Row): Unit = {
        val k = row.getAs[String]("key")
        if (k != null && k.nonEmpty) sink.put(k, row.getAs[String]("doc"))
      }
      override def close(errorOrNull: Throwable): Unit = ()
    }

  /** Streaming exact dedup — the streaming twin of
    * [[graft.operators.Dedup.incremental]]'s batch-internal leg: keep the
    * first record per canonical key, where "first" is arrival order within
    * the watermark horizon. The key is md5-digested so the state store
    * holds 32-char digests instead of document-sized keys, and
    * `dropDuplicatesWithinWatermark` evicts state older than the watermark
    * — O(keys-per-horizon) state, never O(stream). Exactly-once dedup
    * across ALL time needs the batch anti-join against a persisted digest
    * history (the `Dedup.incremental` path); this operator is the
    * in-flight guard that keeps a hot ingest stream from flooding that
    * nightly reconciliation.
    */
  def dedupStream(records: DataFrame, keyCol: String, tsCol: String,
      watermark: String = "2 hours"): DataFrame =
    records
      .withColumn("__digest", md5(col(keyCol).cast("string")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming heavy hitters: the [[graft.functions.SpaceSavingTopK]]
    * sketch as a streaming aggregate. TypedImperativeAggregate state is
    * mergeable and serializable, so partial sketches flow through the
    * streaming state store exactly like partial sums — O(capacity) state
    * TOTAL regardless of stream length or cardinality, the property that
    * makes frequency tracking viable on an unbounded token stream where an
    * exact groupBy-count's state would grow with the vocabulary. Complete
    * output mode: each micro-batch emits the current global top-k.
    */
  def topTokensStream(tokens: DataFrame, tokenCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    import graft.functions.SpaceSavingTopK.spaceSavingTopK
    tokens.groupBy()
      .agg(spaceSavingTopK(col(tokenCol), k, capacity).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item").as("token"), col("e.est_count"))
  }

  /** Stream-static enrichment: join the stream against a bounded dimension
    * via broadcast hash — the streaming twin of the batch lookup join
    * (q23). The static side is re-read and re-broadcast per micro-batch
    * (so slowly-changing dimensions pick up updates between batches), the
    * stream side never shuffles, and no state store is involved — the one
    * stream-join shape with zero streaming state at any scale. Left join:
    * unmatched events pass through with nulls rather than being dropped.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join: pair each `thenType` event
    * with the `firstType` events of the same user in the preceding
    * `windowSeconds` — the canonical funnel/attribution correlation. Both
    * sides carry event-time watermarks and the join condition bounds the
    * event-time distance, so the state store expires rows instead of
    * growing without bound: O(rate × window) state per side — the only
    * stream-stream join shape that survives at scale.
    */
  def correlate(
      events: DataFrame,
      firstType: String,
      thenType: String,
      windowSeconds: Long = 3600L): DataFrame = {
    val first = events.filter(col("event_type") === firstType)
      .select(col("user_id"), col("ts").as("first_ts"), col("value").as("first_value"))
      .withWatermark("first_ts", "2 hours")
    val then_ = events.filter(col("event_type") === thenType)
      .select(col("user_id").as("then_user"), col("ts").as("then_ts"),
        col("value").as("then_value"))
      .withWatermark("then_ts", "2 hours")
    first.join(then_,
        col("user_id") === col("then_user") &&
          col("then_ts") >= col("first_ts") &&
          col("then_ts") <= col("first_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("first_ts"), col("then_ts"),
        col("first_value"), col("then_value"))
  }

  /** Inactivity-gap sessionization via flatMapGroupsWithState: a session
    * closes when no event arrives within `gapSeconds` (event time). State
    * per user is one open session — O(users) state, watermark-evicted.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              open match {
                case Some(s) if t < s.start - gapSeconds * 1000 =>
                  // stray far-in-the-past (but in-watermark) event: it can
                  // never belong to the open session — without it the
                  // naive `t - s.last <= gap` guard is vacuously true for
                  // any past t and would swallow it. Emit it as its own
                  // closed session (documented divergence from the batch
                  // twin, which sees a globally sorted stream).
                  closed += Session(userId, new Timestamp(t), new Timestamp(t), 1, e.value)
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  // in-window out-of-order events must not move the
                  // session backwards
                  open = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  open = Some(Open(t, t, 1, e.value))
                case None =>
                  open = Some(Open(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
