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
  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType       => true
    case ArrayType(et, _) => containsMap(et)
    case st: StructType   => st.fields.exists(f => containsMap(f.dataType))
    case _                => false
  }

  /** Deterministic total order over the full output row — every column in
    * schema order, ascending, NULLS FIRST (matching the oracle wrapper's
    * `ORDER BY ALL NULLS FIRST`). The driver's hash compare must see the
    * same row sequence from both engines regardless of how either engine's
    * physical plan happened to emit rows. Map-typed columns are skipped
    * (unorderable in Spark); they only occur in rows-only queries.
    *
    * INVARIANT (column order): Spark sorts by SCHEMA field order while the
    * oracle's `ORDER BY ALL` uses SELECT-LIST order, so every oracle query's
    * select list MUST name its columns in the same left-to-right order as
    * the Spark query's output schema. All current pairs hold this; a
    * reordered column would surface as an order-only hash mismatch that
    * the name-sorted schema check can't flag.
    *
    * (Collation caveat: Spark compares strings by UTF-16 code unit, DuckDB
    * by UTF-8 byte — identical for ASCII and all BMP text, divergent only
    * for supplementary-plane characters. Current fixtures are ASCII.)
    */
  def canonicalOrder(df: DataFrame): DataFrame = {
    val sortable = df.schema.fields.filterNot(f => containsMap(f.dataType))
    if (sortable.isEmpty) df
    else df.orderBy(sortable.map(f => df(f.name).asc_nulls_first).toSeq: _*)
  }

  /** Same insurance for the DuckDB twin: order by all output columns
    * left-to-right, NULLS FIRST (DuckDB's default is NULLS LAST for ASC,
    * Spark's is NULLS FIRST — pin it explicitly on both sides).
    */
  private def canonicalOracle(sql: String): String =
    s"SELECT * FROM (\n$sql\n) AS graft_canonical ORDER BY ALL NULLS FIRST"

  /** Collect a module's queries into the SparkEntry map shape. Queries
    * without an oracle get no canonical sort — their row order is never
    * hash-checked, so the global sort would be a pure benchmark tax.
    */
  def toQueryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> ((s: SparkSession, dir: String) =>
      if (q.oracle.isDefined) canonicalOrder(q.run(s, dir)) else q.run(s, dir))).toMap

  def toOracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(sql => q.name -> canonicalOracle(sql))).toMap

  /** DuckDB recursive-CTE connected components over an edge-pair SQL:
    * yields `SELECT id, component` where component = min reachable id —
    * the oracle twin of [[graft.operators.ConnectedComponents.run]],
    * shared by every clustering oracle (q28-q31, q44b, q70) so the CC
    * semantics live in exactly one place. Usable as a CTE body (DuckDB
    * accepts a nested WITH RECURSIVE inside a CTE).
    */
  def componentsOverSql(pairsSql: String, srcCol: String, dstCol: String): String = s"""
    WITH RECURSIVE cc_pairs AS (
      SELECT $srcCol AS src, $dstCol AS dst FROM ($pairsSql)),
    cc_edges AS (SELECT src, dst FROM cc_pairs UNION SELECT dst, src FROM cc_pairs),
    cc_nodes AS (SELECT DISTINCT src AS id FROM cc_edges),
    cc_reach AS (
      SELECT id, id AS root FROM cc_nodes
      UNION
      SELECT e.dst AS id, r.root FROM cc_reach r JOIN cc_edges e ON e.src = r.id)
    SELECT id, MIN(root) AS component FROM cc_reach GROUP BY id""".trim
}
