package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.RetrievalIndex

/** Streaming ingest for the persisted inverted index — the
  * [[CurationStream]] pattern applied to retrieval: documents arrive as
  * a stream and each micro-batch tokenizes ONLY ITSELF and appends its
  * postings through the index's bucket spec
  * ([[RetrievalIndex.extend]]), so a continuously-ingesting corpus
  * stays searchable with per-batch cost ∝ batch. `foreachBatch` again:
  * the per-batch work is a write into persisted tables, not an
  * incremental operator state, and queries run on demand against the
  * index rather than inside the stream.
  *
  * Cold start: the first non-empty batch builds the table pair
  * ([[RetrievalIndex.build]]); later batches extend it. The existence
  * probe checks `_meta` — build's LAST write, its commit marker — so a
  * crash mid-build reads as "no index yet" on replay and the rebuild
  * overwrites the orphaned postings instead of extending a half-built
  * pair. Same exactly-once caveat as CurationStream for replayed
  * EXTENDS, same mitigation (stamp appended files with the batch id in
  * production).
  */
object RetrievalStream {

  def start(docs: DataFrame, table: String, path: String,
      nBuckets: Int = 16): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val b = batch.localCheckpoint() // existence probe + postings share it
        if (!b.isEmpty) {
          if (sp.catalog.tableExists(s"${table}_meta"))
            RetrievalIndex.extend(b, table)
          else
            RetrievalIndex.build(b, table, path, nBuckets)
        }
        ()
      }
      .start()
}
