package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic numeric aggregation helpers.
  *
  * Double summation is order-dependent (IEEE-754 addition is not
  * associative), so `sum(double)` differs run-to-run under a shuffle and
  * engine-to-engine vs the DuckDB oracle. Casting each term to a wide
  * decimal makes the sum exact and therefore order-independent; casting the
  * exact result back to double is a single deterministic rounding. This is
  * also the right call at 100 TB: partial aggregation order across 1000
  * executors is never reproducible with raw doubles.
  */
object Num {

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Order-independent average (decimal-exact sum / non-null count). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c).cast(DoubleType)

  /** SQL fragment equivalents for the DuckDB oracle. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 2): String =
    s"(${dsumSql(expr, scale)} / CAST(COUNT($expr) AS DOUBLE))"
}
