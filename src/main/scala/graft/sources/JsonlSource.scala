package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, not, struct, to_json}
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

  /** @return (good rows in `schema`, quarantine rows: raw line only)
    *
    * Compressed input: Spark's JSON reader decompresses `.gz` (and
    * friends) transparently, so a compressed crawl dump reads through
    * this unchanged. The 100 TB contract is MANY gzip files — a single
    * gzip stream is unsplittable (one task decompresses everything),
    * while a directory of shard files parallelizes by file; q214 pins
    * the multi-file shape.
    */
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

  /** [[readWithQuarantine]] plus a POST-PARSE contract audit — the
    * second hole in every tolerant ingest: PERMISSIVE quarantines
    * SYNTAX breakage only, so a line that is perfectly valid JSON but
    * violates the data contract (a required field absent or
    * explicitly null, a value the schema silently nulled) parses
    * "successfully" and sails into the good frame. The caller states
    * the contract as a boolean `Column` over the parsed schema (e.g.
    * `col("doc_id").isNotNull && col("text").isNotNull`, or a
    * `try_cast` non-null check on a string field that must be
    * numeric); rows failing it land in a SECOND quarantine, re-rendered
    * to JSON text so both ledgers carry the evidence in one shape.
    *
    * Plan shape: both audits filter the ONE pinned parse — the split
    * adds no pass over the feed, and the contract predicate is a
    * per-row codegen'd filter.
    *
    * @return (good rows satisfying the contract,
    *          syntax quarantine: raw line,
    *          contract quarantine: the parsed row re-rendered as JSON)
    */
  def readWithContract(spark: SparkSession, path: String,
      schema: StructType, contract: Column)
      : (DataFrame, DataFrame, DataFrame) = {
    val (parsed, syntaxQ) = readWithQuarantine(spark, path, schema)
    // null-safe: a contract evaluating to NULL (null operand in a
    // comparison) is a violation, not a pass — equivalence with
    // the good-side filter must partition every row exactly once
    val holds = coalesceBool(contract)
    val good = parsed.filter(holds)
    val contractQ = parsed.filter(not(holds))
      .select(to_json(struct(parsed.columns.map(col): _*)).as("raw_line"))
    (good, syntaxQ, contractQ)
  }

  private def coalesceBool(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(c,
      org.apache.spark.sql.functions.lit(false))
}
