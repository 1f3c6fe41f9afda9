package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvmRollup

/** Streaming ingest for the persisted IVM rollup — a changelog stream
  * of signed rows (key, dn, dr) folds into the on-disk delta log one
  * micro-batch at a time ([[IvmRollup.applyDelta]]), cost ∝ batch.
  *
  * This is the surface where the rollup's (key, batch_id) replay
  * contract stops being a caveat and becomes EXACTLY-ONCE: Structured
  * Streaming replays a crashed `foreachBatch` with the SAME batch id,
  * the replayed delta rows are byte-identical deterministic aggregates
  * under that id, and [[IvmRollup.serve]]'s per-(key, batch_id) fold
  * collapses them — unlike [[RetrievalStream]]/[[CurationStream]],
  * whose unstamped appends carry the documented "stamp with the batch
  * id in production" caveat, here the stamp IS the storage key.
  *
  * Cold start: if the table does not exist, an EMPTY batch-0 base is
  * written first (the stream owns the whole history); a crash mid-build
  * replays into a rebuild (Overwrite), a crash after it replays into a
  * plain delta apply. Streaming batch ids are 0-based; they fold in as
  * `id + 1` because batch 0 is the base's reserved id.
  */
object IvmStream {

  def start(changes: DataFrame, table: String, path: String,
      nBuckets: Int = 16): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldEpoch(batch, id, table, path, nBuckets)
      }
      .start()

  /** One epoch's fold — exposed for static staging (the
    * [[PairIndexStream.foldCdc]] move): the driver contract and specs
    * replay epochs and crash windows without a streaming runtime.
    * Empty epochs are SKIPPED without stamping — legal here, uniquely
    * among the families, because the rollup has no marker ledger to
    * keep contiguous: exactly-once is the per-(key, batch_id)
    * deterministic-row collapse, not a fence.
    */
  def foldEpoch(batch: DataFrame, id: Long, table: String,
      path: String, nBuckets: Int = 16): Unit = {
    val sp = batch.sparkSession
    val b = batch.localCheckpoint() // existence probe + fold share it
    if (!b.isEmpty) {
      if (!sp.catalog.tableExists(table))
        IvmRollup.build(
          b.select(col("key"), lit(0.0).as("value")).limit(0),
          col("key"), col("value"), table, path, nBuckets)
      IvmRollup.applyDelta(sp, table, b, id + 1)
    }
    ()
  }
}
