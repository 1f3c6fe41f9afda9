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
