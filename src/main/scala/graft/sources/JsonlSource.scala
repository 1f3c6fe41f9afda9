package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines ingest that refuses to drop data silently: every input
  * line either parses against the expected schema or lands in a
  * quarantine frame with its raw text — the split every production
  * ingest needs before a malformed 0.001% of a 100 TB feed becomes an
  * unexplained row-count drift. (DROPMALFORMED hides the problem;
  * FAILFAST turns one bad line into a dead pipeline; PERMISSIVE +
  * quarantine keeps the run alive AND the evidence.)
  *
  * The parsed frame is materialized once (`localCheckpoint`) before the
  * split: Spark's lazy JSON parse disallows/garbles predicates over the
  * corrupt-record column on an uncached read, and materializing also
  * makes the two branches read one parse, not two passes over the feed.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** @return (good rows in `schema`, quarantine rows: raw line only) */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol), s"$CorruptCol is reserved")
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .localCheckpoint()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantine)
  }
}
