package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming ingest for the EXACT near-dup pair index — documents
  * arrive as a stream, each micro-batch pairs ONLY against itself and
  * the persisted history ([[Dedup.extendPairIndex]]: prefix-posting
  * probe + digest verify, cost ∝ batch), so the pair graph — and every
  * audit served from it (q154's leakage, q44b's clusters) — stays
  * current under continuous ingest. The [[RetrievalStream]] pattern
  * applied to the exact dedup tier.
  *
  * Cold start: the first non-empty batch builds the three-table index
  * ([[Dedup.buildPairIndex]] incremental mode — pairs, digest sets,
  * prefix postings, written in that order). The existence probe checks
  * `_postings`, the LAST write and therefore the commit marker: a
  * crash mid-build reads as "no index yet" on replay and the rebuild
  * overwrites the orphaned partial tables. Replayed EXTENDS carry the
  * same exactly-once caveat as [[RetrievalStream]] (appends are not
  * batch-stamped; stamp them in production) — [[IvmStream]] shows the
  * stamped alternative where the storage key absorbs replays.
  */
object PairIndexStream {

  def start(docs: DataFrame, table: String, path: String,
      threshold: Double, nBuckets: Int = 8): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val b = batch.localCheckpoint() // existence probe + both paths share it
        if (!b.isEmpty) {
          if (sp.catalog.tableExists(s"${table}_postings"))
            Dedup.extendPairIndex(sp, b, table, threshold)
          else
            Dedup.buildPairIndex(b, table, path, threshold, nBuckets,
              incremental = true)
        }
        ()
      }
      .start()
}
