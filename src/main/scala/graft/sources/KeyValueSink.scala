package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Key-value document sink abstraction (reference S6/S7: Firebase RTDB
  * `set()` per key, `/root/reference/index_align_to_firebase.py:462-525`,
  * `executive_review_tool.py:513-605`).
  *
  * The engine ships the scale-correct *shape*: documents are written from
  * `foreachPartition`, so 1000 executors each stream their partition's keys
  * through one connection — never a driver-side loop of RPCs (the
  * reference's N+1 pattern). Implementations are idempotent PUT-per-key,
  * so task retries are safe (at-least-once → last-write-wins).
  *
  * A network RTDB client is out of scope for this environment (zero
  * egress); [[FsKeyValueSink]] is the filesystem-backed implementation used
  * by tests and the pipelines' local mode.
  */
trait KeyValueSink extends Serializable {

  /** Idempotent upsert of one document. */
  def put(key: String, json: String): Unit

  /** Number of keys currently under the sink root (S8 verification). */
  def count(): Long
}

/** Filesystem-backed sink: one file per key under `root`. */
final class FsKeyValueSink(root: String) extends KeyValueSink {
  Files.createDirectories(Paths.get(root))

  override def put(key: String, json: String): Unit = {
    val cleaned = key.replaceAll("[^A-Za-z0-9_.-]", "_")
    // sanitization is lossy ("a/b" and "a_b" both clean to "a_b"), so any
    // key it altered gets the full md5 of the ORIGINAL key as a suffix —
    // distinct dirty keys keep distinct files (up to md5 collision), and
    // the name stays deterministic (retries overwrite the same file). A
    // clean key that happens to LOOK like a suffixed name is the one
    // residual ambiguity; callers with such key schemes should pre-hash.
    val safe =
      if (cleaned == key) key
      else {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes(StandardCharsets.UTF_8))
        cleaned + "-" + d.map("%02x".format(_)).mkString
      }
    Files.write(Paths.get(root, s"$safe.json"), json.getBytes(StandardCharsets.UTF_8))
  }

  override def count(): Long = {
    val s = Files.list(Paths.get(root)) // close: each open stream holds an fd
    try s.count() finally s.close()
  }
}

object KeyValueSink {

  /** Result of a sink run (success/skip counters mirror the reference's
    * per-key accounting; `verifiedCount` is the post-write readback).
    */
  final case class SinkReport(written: Long, skipped: Long, verifiedCount: Long)

  /** Write `df` to a sink: `keyCol` names the document key, every other
    * column is serialized into the JSON document. Null keys are skipped
    * (and counted), not failed — reference behavior.
    *
    * `dryRun` prints a bounded sample instead of writing (S9).
    */
  def write(
      df: DataFrame,
      keyCol: String,
      mkSink: () => KeyValueSink,
      dryRun: Boolean = false): SinkReport = {
    val payloadCols = df.columns.filterNot(_ == keyCol)
    val prepared = df.select(
      col(keyCol).cast("string").as("__key"),
      // explicit nulls — document stores treat null as "clear", absent as
      // "leave unchanged"
      to_json(struct(payloadCols.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("__doc"))

    if (dryRun) {
      prepared.show(3, truncate = false)
      return SinkReport(0, 0, mkSink().count())
    }

    val spark = df.sparkSession
    val written = spark.sparkContext.longAccumulator("kv_written")
    val skipped = spark.sparkContext.longAccumulator("kv_skipped")
    prepared.foreachPartition { rows: Iterator[Row] =>
      val sink = mkSink() // per-partition connection/init
      rows.foreach { r =>
        val k = r.getString(0)
        if (k == null || k.isEmpty) skipped.add(1)
        else { sink.put(k, r.getString(1)); written.add(1) }
      }
    }
    SinkReport(written.value, skipped.value, mkSink().count())
  }
}
