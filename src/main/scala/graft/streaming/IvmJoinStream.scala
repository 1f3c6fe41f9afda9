package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvmJoin

/** Streaming ingest for the maintained join view ([[IvmJoin]]) — one
  * changelog stream carries BOTH sides' churn (the snapshot-then-stream
  * CDC pattern: [[IvmJoin.build]] loads the initial snapshots, then the
  * stream folds deltas). Rows are the UNION schema tagged with a `side`
  * column ∈ {"fact", "dim"} plus the signed `dn`; each side projects
  * its own columns (`factCols` / `dimCols`) and the epoch folds through
  * [[IvmJoin.applyDelta]] under the epoch-derived stamp.
  *
  * Exactly-once end to end, inherited from the apply protocol: the
  * stamp is `epochId + 1` (stable across replays — the foreachBatch
  * contract), a committed replay no-ops on the marker, a crashed
  * replay recomputes against the SAME pre-state (pre-state reads
  * exclude the applying batch's own stamp) and re-appends
  * byte-identical rows the serve collapse folds. One checkpoint owns
  * one view (the [[PairIndexStream]] single-writer contract).
  */
object IvmJoinStream {

  def start(changelog: DataFrame, table: String, key: String,
      factCols: Seq[String], dimCols: Seq[String]): StreamingQuery =
    changelog.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        foldEpoch(batch, epochId, table, key, factCols, dimCols)
      }
      .start()

  /** One epoch's fold — exposed for static staging (the
    * [[PairIndexStream.foldCdc]] move): the driver contract and specs
    * can replay epochs and crash windows without a streaming runtime.
    */
  def foldEpoch(batch: DataFrame, epochId: Long, table: String, key: String,
      factCols: Seq[String], dimCols: Seq[String]): Unit = {
    val sp = batch.sparkSession
    val b = batch.localCheckpoint() // both sides share one read
    IvmJoin.applyDelta(sp, table, key,
      factDelta = b.filter(col("side") === "fact")
        .select((factCols :+ "dn").map(col): _*),
      dimDelta = b.filter(col("side") === "dim")
        .select((dimCols :+ "dn").map(col): _*),
      batchId = epochId + 1)
  }
}
