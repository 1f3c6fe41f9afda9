package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's public surface.
  *
  * @param name   stable identifier (keys `SparkEntry.queries`)
  * @param oracle equivalent ANSI SQL for the DuckDB oracle over the same
  *               parquet tables, or None for semantics DuckDB cannot
  *               express (driver falls back to a rows-only check)
  * @param run    the Spark implementation
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object GraftQuery {
  /** Collect a module's queries into the SparkEntry map shape. */
  def toQueryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def toOracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
