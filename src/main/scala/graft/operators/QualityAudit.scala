package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declarative data-quality audit — the Deequ-style constraint gate every
  * ingest runs before a table enters the corpus. The caller states WHAT
  * must hold; the runner compiles the whole constraint set into the
  * fewest passes:
  *
  *   - every row-local constraint ([[QualityAudit.NotNull]],
  *     [[QualityAudit.Expect]]) and every uniqueness constraint folds
  *     into ONE aggregate over ONE scan of the table — `sum(CASE ...)` /
  *     `count − count(distinct)` terms, map-side combined. Adding a
  *     constraint adds an expression, not a pass.
  *   - each [[QualityAudit.ForeignKey]] is one anti-join of the fact
  *     side's DISTINCT keys against the dimension — probe cost ∝ key
  *     cardinality, not fact rows, and the dimension side broadcasts
  *     under Spark's own threshold.
  *
  * The single aggregate row is locally checkpointed before it fans out
  * into per-constraint report rows (a one-row bounded pin — without it,
  * each report row's `select` would re-run the full scan). Output is one
  * row per constraint: (constraint, n_rows, n_violations, passed) —
  * dimension-sized from fact-sized input, the report shape that still
  * works when the audited table is 100 TB.
  */
object QualityAudit {

  sealed trait Constraint

  /** Column must be non-null on every row. */
  final case class NotNull(column: String) extends Constraint

  /** Generic row-local predicate: `violation` is true on BAD rows. */
  final case class Expect(name: String, violation: Column) extends Constraint

  /** The column set must have no duplicate combinations. */
  final case class Unique(columns: Seq[String]) extends Constraint

  /** Every non-null `column` value must exist as `dimKey` in `dim`. */
  final case class ForeignKey(column: String, dim: DataFrame, dimKey: String)
      extends Constraint

  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    // (report name, violation-count aggregate) for the single-pass block
    val onePass: Seq[(String, Column)] = constraints.collect {
      case NotNull(c) =>
        s"complete_$c" -> sum(col(c).isNull.cast(LongType))
      case Expect(name, viol) =>
        name -> sum(viol.cast(LongType))
      case Unique(cols) =>
        s"unique_${cols.mkString("_")}" ->
          (count(lit(1)) - countDistinct(cols.head, cols.tail: _*))
    }
    val aggCols = count(lit(1)).as("n_rows") +:
      onePass.zipWithIndex.map { case ((_, c), i) => c.as(s"v_$i") }
    val base = df.agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint() // one bounded row, read once per report line
    val onePassRows = onePass.zipWithIndex.map { case ((name, _), i) =>
      base.select(lit(name).as("constraint"), col("n_rows"),
        coalesce(col(s"v_$i"), lit(0L)).as("n_violations"),
        (coalesce(col(s"v_$i"), lit(0L)) === 0L).as("passed"))
    }
    val fkRows = constraints.collect { case ForeignKey(c, dim, dk) =>
      val viol = df.select(col(c)).filter(col(c).isNotNull).distinct()
        .join(dim.select(col(dk)), col(c) === col(dk), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      base.select(col("n_rows")).crossJoin(viol) // 1×1: broadcast-scalar shape
        .select(lit(s"fk_${c}").as("constraint"), col("n_rows"),
          col("n_violations"), (col("n_violations") === 0L).as("passed"))
    }
    (onePassRows ++ fkRows).reduce(_ unionAll _)
  }
}
