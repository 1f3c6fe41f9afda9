package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row, attach the right
  * row with the greatest `rightTime <= leftTime` within the same key.
  *
  * Spark has no built-in as-of join; rather than a custom SparkPlan, this
  * uses the classic union trick — tag both inputs, sort within key by
  * (time, tag) and carry right values forward with `last(..., ignoreNulls)`
  * over an unbounded-preceding window. One shuffle on the key, one sort,
  * no point lookups: the shape that survives a 1000-executor scale-up
  * (compare a broadcast-probe or per-row subquery, which don't).
  *
  * Right rows must be unique per (keys, rightTime) — pre-aggregate
  * duplicates or the carried value is ambiguous.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (unique per key+time)
    * @param keys      equi-join keys
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @param inner     drop left rows with no match (else keep with nulls)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      inner: Boolean = true): DataFrame = {

    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTime)

    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)

    // right rows sort before left rows at equal time → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = l.unionByName(r)
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          leftPayload.map(col) ++
          rightPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .withColumnRenamed("__t", leftTime)
      .drop("__side")

    if (inner) carried.filter(rightPayload.map(c => col(c).isNotNull).reduce(_ && _))
    else carried
  }
}
