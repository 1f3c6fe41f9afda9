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
    val withCorrupt = corruptSchema(schema)
    splitQuarantine(spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))
  }

  /** [[readWithQuarantine]] for ZSTD-compressed JSONL shards — the
    * codec crawl dumps increasingly ship (.zst), which Spark's text
    * sources do NOT decode (the builtin codec list stops at gzip/lz4;
    * Hadoop's zstd needs a native lib this is not entitled to assume).
    * The entry path decodes it explicitly with the zstd-jni ALREADY on
    * every Spark classpath (shuffle/parquet compression ships it):
    * `binaryFile` scan (one row per shard) → per-shard streaming
    * ZstdInputStream → line split → the SAME pinned PERMISSIVE parse
    * and quarantine split as every other entry path.
    *
    * Splittability contract, stated like gzip's: one zstd FRAME is not
    * split either — a shard is decoded by one task, parallelism comes
    * from the shard-file count, so dumps must arrive as many shard
    * files (they do; that is how they are produced). Per-shard memory
    * = the compressed bytes (binaryFile materializes the file) + the
    * decoder's window, so shards sized for upload (100s of MB) are
    * fine and a single multi-TB .zst is the caller's bug — same rule
    * as .gz, documented rather than hidden behind an OOM.
    */
  def readZstdWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zst").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(bytes)),
          java.nio.charset.StandardCharsets.UTF_8))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
      }
    val withCorrupt = corruptSchema(schema)
    splitQuarantine(spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(lines))
  }

  private def corruptSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol), s"$CorruptCol is reserved")
    StructType(schema.fields :+ StructField(CorruptCol, StringType))
  }

  /** One pinned parse, two branches — shared by every entry codec. */
  private def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val raw = parsed.localCheckpoint()
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
