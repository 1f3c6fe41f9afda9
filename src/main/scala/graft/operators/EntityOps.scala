package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Coercions

/** Entity-pipeline operators from the reference, as declarative DataFrame
  * transforms: position derivation, group-and-nest with last-wins dedup,
  * lookup join with warned anti side, confidence banding, consolidation.
  */
object EntityOps {

  /** Position derivation (F7, `/root/reference/index_align_to_firebase.py:347-361`).
    * Exact evaluation order: Total<=0 → NEUTRAL; a>=n && a>=p → AGAINST;
    * p>=n && p>=a → PRO; else NEUTRAL. Ties favor AGAINST, then PRO.
    */
  def position(against: Column, neutral: Column, pro: Column): Column = {
    val total = against + neutral + pro
    when(total <= 0, "NEUTRAL")
      .when(against >= neutral && against >= pro, "AGAINST")
      .when(pro >= neutral && pro >= against, "PRO")
      .otherwise("NEUTRAL")
  }

  /** Equivalent CASE expression for an external SQL oracle. */
  def positionSql(a: String, n: String, p: String): String =
    s"""CASE WHEN ($a + $n + $p) <= 0 THEN 'NEUTRAL'
       |     WHEN $a >= $n AND $a >= $p THEN 'AGAINST'
       |     WHEN $p >= $n AND $p >= $a THEN 'PRO'
       |     ELSE 'NEUTRAL' END""".stripMargin

  /** Last-wins dedup on a key (A1's dict-overwrite semantics,
    * `/root/reference/index_align_to_firebase.py:276` — Spark has no implicit
    * row order, so "last" is defined by `orderCol` descending).
    */
  def lastWins(df: DataFrame, keys: Seq[String], orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Group-and-nest (A1): one row per `groupKey` with a sorted array of
    * per-subkey structs — the relational form of the reference's
    * company → issue → values tree. Deterministic: array sorted by subkey.
    */
  def groupAndNest(df: DataFrame, groupKey: String, subKey: String, values: Seq[String]): DataFrame =
    df.groupBy(col(groupKey))
      .agg(sort_array(collect_list(struct((subKey +: values).map(col): _*))).as("entries"))

  /** Map-shaped variant of [[groupAndNest]] — the reference's literal
    * output model (`company_id → {issue → values}`,
    * `/root/reference/index_align_to_firebase.py:271-280`). Requires the
    * input already deduped on (groupKey, subKey) (see [[lastWins]]);
    * `map_from_entries` fails on duplicate keys rather than silently
    * keeping one.
    */
  def groupAndNestMap(df: DataFrame, groupKey: String, subKey: String, values: Seq[String]): DataFrame =
    df.groupBy(col(groupKey))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col(subKey), struct(values.map(col): _*)))))
        .as("entries"))

  /** Lookup (dimension) join with warned anti side (J1/P6):
    * matched rows continue enriched; unmatched fact keys surface as data
    * (`unmapped`), deduplicated — the reference's warn-once-per-ticker set
    * (`/root/reference/index_align_to_firebase.py:251-261`).
    */
  final case class LookupResult(matched: DataFrame, unmapped: DataFrame)

  def lookupJoin(facts: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column): LookupResult = {
    val joined = facts.join(broadcast(dim), factKey === dimKey, "left")
    LookupResult(
      matched = joined.filter(dimKey.isNotNull),
      unmapped = facts.filter(factKey.isNotNull)
        .join(broadcast(dim), factKey === dimKey, "left_anti")
        .select(factKey.as("unmapped_key")).distinct())
  }

  /** Confidence banding (A6, `/root/reference/executive_review_tool.py:365-377`). */
  def band(avgSim: Column, high: Double = 85.0, low: Double = 75.0): Column =
    when(avgSim >= high, "high").when(avgSim >= low, "uncertain").otherwise("low")

  /** Best-record selection score: completeness first, lowest id as the
    * deterministic tie-break (the reference's argmax keeps first-seen,
    * `/root/reference/executive_review_tool.py:540`).
    */
  def bestRecordScore(fields: Seq[Column], id: Column, maxId: Long = 1000000000L): Column =
    Coercions.completeness(fields).cast("long") * lit(maxId) - id.cast("long")
}
