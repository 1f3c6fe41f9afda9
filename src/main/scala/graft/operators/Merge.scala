package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot maintenance without a table format: upsert (MERGE
  * INTO's write side) and snapshot diff (its audit side). Both are plain
  * key-shuffle joins — at 100 TB, pair them with key-bucketed layout
  * ([[graft.sources.TableWriter.writeBucketed]]) and the shuffles
  * disappear; verify the rewritten snapshot with
  * [[Integrity.fingerprint]].
  */
object Merge {

  /** Last-writer-wins upsert: rows of `updates` replace base rows with
    * the same key, new keys append. When `updates` can hold several rows
    * per key, pass `orderCol` — the row with the LARGEST value wins
    * (ties broken arbitrarily: make the order total for determinism);
    * without it, updates must be key-unique (enforced cheaply downstream
    * by the caller's own key constraints, not re-counted here).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      orderCol: Option[Column] = None): DataFrame = {
    val up = orderCol match {
      case None => updates
      case Some(o) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(o.desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }
    base.join(up.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(up)
  }

  /** SCD2 (type-2 slowly-changing dimension) history from a full event
    * log: one row per ATTRIBUTE RUN — consecutive events with an
    * unchanged attribute collapse, a change closes the previous row
    * (`valid_to` = change time) and opens a new one (`valid_to` NULL,
    * `is_current`). Output: (key, attr, valid_from, valid_to,
    * is_current). `tie` makes same-timestamp ordering total.
    *
    * Two windows over one key shuffle (lag to find changes, lead over
    * the change rows to close them) — the standard warehouse history
    * build, key-parallel at any scale.
    */
  def scd2FromHistory(events: DataFrame, key: String, ts: Column, tie: Column,
      attr: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("valid_from").asc, col("__tie").asc)
    events
      .select(col(key), ts.as("valid_from"), tie.as("__tie"), attr.as("attr"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      // null-safe change test: a NULL attr is a value, not a wildcard
      .filter(col("__rn") === 1 || !(col("__prev") <=> col("attr")))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col(key), col("attr"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Incremental SCD2 maintenance: fold a new event batch into an
    * existing history WITHOUT touching untouched keys' rows. Closed rows
    * of touched keys are kept verbatim; each touched key's CURRENT row
    * becomes the seed event (ordered before any batch event via a
    * sentinel tie), so a batch opening with the same attribute extends
    * the current run instead of duplicating it. Cost ∝ batch keys, not
    * history. Contract: batch timestamps are ≥ the touched keys' current
    * `valid_from` (append-only time — the usual CDC guarantee).
    *
    * `scd2Apply(scd2FromHistory(A), B) == scd2FromHistory(A ∪ B)` under
    * that contract (spec-checked).
    */
  def scd2Apply(current: DataFrame, batch: DataFrame, key: String, ts: Column,
      tie: Column, attr: Column): DataFrame = {
    val touched = batch.select(col(key)).distinct()
    val untouched = current.join(touched, Seq(key), "left_anti")
    val ofTouched = current.join(touched, Seq(key), "left_semi")
    val closed = ofTouched.filter(!col("is_current"))
    // seeds order before any same-timestamp batch event via a RANK field
    // inside a struct tie (structs compare lexicographically), keeping the
    // caller's tie column at its native type — no narrowing cast, no
    // sentinel value that a legitimate tie could collide with
    val tieType = batch.select(tie.as("t")).schema.head.dataType
    val seeds = ofTouched.filter(col("is_current"))
      .select(col(key), col("valid_from").as("__ts"),
        struct(lit(0).as("r"), lit(null).cast(tieType).as("t")).as("__tie"), col("attr"))
    val events = seeds.unionByName(
      batch.select(col(key), ts.as("__ts"),
        struct(lit(1).as("r"), tie.as("t")).as("__tie"), attr.as("attr")))
    val rebuilt = scd2FromHistory(events, key, col("__ts"), col("__tie"), col("attr"))
    untouched.unionByName(closed).unionByName(rebuilt)
  }

  /** Apply a CDC changelog to a keyed snapshot: per key, the change with
    * the LARGEST `order` wins — an upsert (`op` != "D") replaces or
    * inserts the row, a delete (`op` == "D") removes it, and earlier
    * changes to the same key are superseded (a delete followed by a
    * later upsert resurrects the key). Contract: `changes` carries every
    * `base` column (delete payloads may be null — only their key is
    * read) and `order` is a TOTAL order per key (pass a
    * `struct(ts, seq)` when timestamps can tie).
    *
    * One per-key window over the CHANGES (sized by the batch, never the
    * snapshot) plus one anti-join against the batch's keys — the same
    * cost-∝-batch shape as [[upsert]] and [[scd2Apply]], which is what
    * lets a 100 TB snapshot absorb a stream of small batches. The
    * batch-per-trigger streaming twin is `foreachBatch(applyChangelog)`.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keys: Seq[String],
      order: Column, op: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(order.desc)
    val latest = changes
      .withColumn("__op", op)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(latest.filter(col("__op") =!= "D")
        .select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Classify every key whose row differs between two snapshots:
    * `added` (only in `b`), `removed` (only in `a`), `changed` (present
    * in both, compared columns differ). Identical rows produce NOTHING —
    * the output is the changeset, sized by the change, not the table.
    * Rows compare by [[Integrity.rowHash]] over `cols`, so wide rows
    * travel the full-outer shuffle as key + 8 bytes. Keys join
    * NULL-SAFELY (`<=>`): a NULL-keyed row present identically on both
    * sides is a match, not a spurious added+removed pair.
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
      cols: Seq[String]): DataFrame = {
    val ha = a.select(keys.map(col) :+ Integrity.rowHash(cols.map(col)).as("__ha"): _*)
    val hb = b.select(keys.map(k => col(k).as(s"__b_$k"))
      :+ Integrity.rowHash(cols.map(col)).as("__hb"): _*)
    val cond = keys.map(k => ha(k) <=> hb(s"__b_$k")).reduce(_ && _)
    ha.join(hb, cond, "full_outer")
      .withColumn("status",
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") =!= col("__hb"), "changed"))
      .filter(col("status").isNotNull)
      .select(keys.map(k => coalesce(col(k), col(s"__b_$k")).as(k))
        :+ col("status"): _*)
  }
}
