package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{IndelRatio, TokenSortRatio}

/** SQL surface for graft's custom Catalyst expressions: registers
  * `indel_ratio(a, b)` and `token_sort_ratio(a, b)` so `spark.sql` users
  * get the same codegen'd kernels as the Column API.
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time, or
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.indelRatioDesc)
    ext.injectFunction(GraftExtensions.tokenSortRatioDesc)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def binary(name: String, build: Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.functions", name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects exactly 2 arguments")
      build(args)
    })

  private[graft] val indelRatioDesc =
    binary("indel_ratio", args => IndelRatio(args(0), args(1)))

  private[graft] val tokenSortRatioDesc =
    binary("token_sort_ratio", args => TokenSortRatio(args(0), args(1)))

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "indel_ratio", args => IndelRatio(args(0), args(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_sort_ratio", args => TokenSortRatio(args(0), args(1)), "scala_udf")
  }
}
