package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Coercions, RoleResolver}
import graft.operators.EntityOps

/** The issues pipeline (reference 3.1, `/root/reference/
  * index_align_to_firebase.py:527-664`) as one lazy Spark plan:
  *
  * scan → role resolution (P1) → coercion (P2) → validity filters (P4/P5)
  * → broadcast ticker lookup (J1) with warned anti side (P6) → Total +
  * Position derivation (F7/F10) → last-wins dedup + group-and-nest (A1)
  * → cardinality validation (A2) → summary stats (A3).
  *
  * The reference's console approval gate becomes data flow: callers export
  * the review dataset ([[graft.sources.ReviewExport]]), collect approval,
  * then run the sink ([[graft.sources.KeyValueSink]]) — no engine operator
  * blocks on a human.
  */
object IssuesPipeline {
  import RoleResolver.Role

  /** Role synonyms, verbatim from the reference
    * (`index_align_to_firebase.py:183-221`). */
  val roles: Seq[Role] = Seq(
    Role("ticker", Seq("ticker", "company_ticker", "symbol")),
    Role("issue_name", Seq("issue_name", "issue", "name")),
    Role("against", Seq("against", "against_amount", "against_value")),
    Role("neutral", Seq("neutral", "neutral_amount", "neutral_value")),
    Role("pro", Seq("pro", "pro_amount", "pro_value", "for", "for_amount")))

  final case class Result(
      /** one row per company: company_id + sorted array of issue structs */
      nested: DataFrame,
      /** flat derived rows (review export shape) */
      derived: DataFrame,
      /** distinct tickers with no company mapping (P6, warn-once) */
      unmappedTickers: DataFrame,
      /** companies whose issue count != expectedIssues (A2) */
      invalidCardinality: DataFrame,
      /** single-row summary: companies, issues, avg issues/company (A3) */
      summary: DataFrame)

  /** @param issues  raw issues table (any synonym column names)
    * @param tickers two columns: `ticker` (uppercase), `company_id`
    * @param expectedIssues the A2 validation cardinality (reference: 8)
    */
  def run(issues: DataFrame, tickers: DataFrame, expectedIssues: Int = 8): Result = {
    val resolved = RoleResolver.project(issues, roles)

    val coerced = resolved.select(
      Coercions.normalizeTicker(col("ticker")).as("ticker"),
      trim(col("issue_name")).as("issue_name"),
      Coercions.numCoerce(col("against")).as("against"),
      Coercions.numCoerce(col("neutral")).as("neutral"),
      Coercions.numCoerce(col("pro")).as("pro"))
      .filter(Coercions.isValidTicker(col("ticker")) &&
        Coercions.isNonEmpty(col("issue_name")))

    val dim = tickers.select(upper(trim(col("ticker"))).as("t_key"), col("company_id"))
    val looked = EntityOps.lookupJoin(coerced, dim, col("ticker"), col("t_key"))

    val derived = looked.matched
      .withColumn("total", col("against") + col("neutral") + col("pro"))
      .withColumn("position",
        EntityOps.position(col("against"), col("neutral"), col("pro")))
      .select("company_id", "ticker", "issue_name", "against", "neutral", "pro",
        "total", "position")

    // A1 last-wins on (company, issue): "last" = latest input order; with
    // no order column in the reference schema we use the largest rowid of
    // the physical scan order made explicit
    val withSeq = derived.withColumn("__seq", monotonically_increasing_id())
    val deduped = EntityOps.lastWins(withSeq, Seq("company_id", "issue_name"), col("__seq"))
      .drop("__seq")

    val nested = EntityOps.groupAndNest(deduped, "company_id", "issue_name",
      Seq("against", "neutral", "pro", "total", "position"))

    val cardinality = deduped.groupBy("company_id")
      .agg(count(lit(1)).as("n_issues"))
      .filter(col("n_issues") =!= expectedIssues)

    val summary = deduped.agg(
      countDistinct(col("company_id")).as("total_companies"),
      count(lit(1)).as("total_issues"),
      (count(lit(1)).cast("double") /
        greatest(countDistinct(col("company_id")), lit(1)).cast("double"))
        .as("avg_issues_per_company"))

    Result(nested, deduped, looked.unmapped, cardinality, summary)
  }
}
