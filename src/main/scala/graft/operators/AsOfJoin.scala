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
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    // output columns are keys ++ leftTime ++ leftPayload ++ rightPayload:
    // a right payload column may collide with a LEFT payload column or
    // with the leftTime name itself (leftPayload excludes leftTime by
    // construction, so that direction can't collide)
    val clash = rightPayload.intersect(leftPayload :+ leftTime)
    require(clash.isEmpty,
      s"right payload columns would collide with left output columns: " +
        s"${clash.mkString(", ")} — rename or drop one side's")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__")).distinct
    require(reserved.isEmpty,
      s"column names starting with __ are reserved by asof: ${reserved.mkString(", ")}")

    // the right payload travels as ONE struct, so the carried values always
    // come from the same right row even when individual fields are null
    // (per-column carry would stitch together fields of different rows)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightPayload.map(c => right.schema(c).copy(name = c)))).as("__r"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__r"): _*)

    // right rows sort before left rows at equal time → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (keys.map(col) :+ col("__t").as(leftTime)) ++
          leftPayload.map(col) ++
          rightPayload.map(c => col(s"__r.$c").as(c)) :+
          col("__r").isNotNull.as("__matched"): _*)

    val result = if (inner) carried.filter(col("__matched")) else carried
    result.drop("__matched")
  }
}
