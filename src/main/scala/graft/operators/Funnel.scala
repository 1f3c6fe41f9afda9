package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-bounded event correlation (batch twin of the stream-stream
  * interval join in [[graft.streaming.EventStreams]]).
  *
  * "Did a follow event happen within W of the trigger, per key?" is an
  * equi-join on the key plus a range predicate on time — Spark shuffles
  * both sides once on the key and evaluates the band inside the join, so
  * the pair space is per-key, never global. At 100 TB the key join
  * partitions the work; heavily skewed keys (one user with millions of
  * events) re-split under AQE skew-join handling, and the band predicate
  * keeps per-key pair growth linear in practice because real event streams
  * are time-sparse relative to the window.
  */
object Funnel {

  /** Earliest qualifying follow per trigger: for every trigger row, the
    * minimum `follow.ts - trigger.ts` over follows with the same key in
    * `[ts, ts + windowSec]` — full timestamp precision, both bounds
    * inclusive, exactly [[graft.streaming.EventStreams.correlate]]'s
    * condition, so batch and streaming counts agree event-for-event.
    * Triggers with no qualifying follow drop out (an outer variant is a
    * left join away; conversion RATES need the trigger count, which
    * callers keep from the input).
    *
    * @param triggers (key, id, ts) — id must be unique per trigger row
    * @param follows  (key, ts)
    * @return (key, id, lag_s) — lag of the earliest follow, in seconds
    *         (DOUBLE: sub-second lags survive; integral for
    *         second-truncated inputs)
    */
  def conversions(triggers: DataFrame, follows: DataFrame,
      windowSec: Long): DataFrame = {
    val t = triggers.select(col("key"), col("id"), col("ts").as("__t_ts"))
    val f = follows.select(col("key").as("__f_key"), col("ts").as("__f_ts"))
    t.join(f,
        col("key") === col("__f_key") &&
          col("__f_ts") >= col("__t_ts") &&
          col("__f_ts") <= col("__t_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .groupBy(col("key"), col("id"))
      .agg((min(unix_micros(col("__f_ts")) - unix_micros(col("__t_ts"))).cast("double")
        / 1e6).as("lag_s"))
  }
}
