package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** House rule (round-5 lesson, q152): no dumped query may output a raw
    * DecimalType column. The driver's comparator coerces decimals to float
    * on one side only ("1234.5" vs "1234.50" → hash fail), while the local
    * oracle gate str()s them — so a decimal output passes locally and fails
    * the round. Decimal-exact arithmetic is for INTERNAL sums (Num.dsum);
    * the final column must be cast to DOUBLE.
    */
  def assertNoDecimalOutput(name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    val decimals = schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
    }
    require(decimals.isEmpty,
      s"$name outputs DecimalType column(s) ${decimals.mkString(", ")} — " +
        "cast the final column to DOUBLE (Num.dsum rule); raw decimals " +
        "hash-mismatch in the driver's comparator")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet // optional query-name subset (dev iteration)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture-drift preflight: a regenerated fixture should fail with a
    // diagnosis up front, not as per-query analysis errors mid-run
    graft.core.Tables.preflight(spark, sfDir)
      .foreach(m => System.err.println(s"[verify] $m"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertNoDecimalOutput(name, df.schema) // q152 lesson — see Scaladoc
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
