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
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
