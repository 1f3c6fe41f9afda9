package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver's parquet fixtures (TESTDATA.md).
  *
  * Each table is a directory-less single parquet file at `dir/<name>.parquet`.
  * At production scale these would be partitioned/bucketed tables behind a
  * metastore; the accessors keep call-sites agnostic to that, so swapping
  * `spark.read.parquet` for `spark.table` is a one-line change.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long behind the legacy flag; normalize it back to TimestampType
    * (microsecond precision) so downstream code sees a regular timestamp.
    *
    * The flag is only consulted during schema resolution, which
    * `spark.read.parquet` performs eagerly, so it is set just for this
    * call and the prior session value restored — reading `events` no
    * longer changes how OTHER reads in the session treat nanos columns.
    * ns→µs uses floor division ((ts - pmod) div 1000), not `div` alone:
    * plain `div` truncates toward zero, which would round pre-epoch
    * (negative) nanos the wrong way.
    */
  def events: DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
