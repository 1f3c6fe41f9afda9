package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Reviewable canonical-JSON export (reference S5:
  * `/root/reference/index_align_to_firebase.py:317-383`,
  * `executive_review_tool.py:384-437`): the dataset a human signs off on
  * before the sink runs, plus a metadata envelope.
  *
  * Canonical = deterministic: callers pass the sort keys; rows are written
  * in that order as JSON lines with fields in schema order. Review exports
  * are human-scale by contract, so the single-file `coalesce(1)` is a
  * deliberate non-distributed step — the full dataset never goes through
  * here.
  */
object ReviewExport {

  /** Write `df` as one sorted JSON-lines file + `_metadata.json` envelope
    * (row count, export timestamp, free-form context entries).
    *
    * @return the row count exported
    */
  def write(df: DataFrame, outDir: String, sortKeys: Seq[String],
      context: Map[String, String] = Map.empty): Long = {
    val n = df.count()
    df.orderBy(sortKeys.map(col): _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .json(outDir)

    val meta = df.sparkSession.range(1).select(
      lit(n).as("total_records"),
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").as("exported_at"),
      to_json(map(context.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
        .as("context"))
    meta.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$outDir/_metadata")
    n
  }
}
