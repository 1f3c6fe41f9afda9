package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named SparkEntry
  * queries (the source of docs/PLANS.md). Usage:
  * `runMain graft.Plans q55_stratified_sample q59_decontamination`
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    args.foreach { name =>
      // op:* pseudo-names print the bare operator plan, without the
      // canonical ORDER BY the oracle harness appends to every query
      val df = name match {
        case "op:sampling" => graft.operators.Sampling.stratifiedHash(
          graft.core.Tables(spark, sfDir).documents,
          col("doc_id"), col("lang"), Map("en" -> 30), defaultPct = 60)
        case "op:chunker" => graft.operators.Chunker.fixedChunks(
          graft.core.Tables(spark, sfDir).documents,
          col("doc_id"), col("text"), size = 200, overlap = 40)
        case "op:cosinepairs" => graft.operators.VectorOps.cosinePairs(
          graft.core.Tables(spark, sfDir).embeddings
            .select(col("vec_id").as("id"), col("embedding").as("vec")),
          threshold = 0.40, dim = 64, localThreshold = 0L) // forced bucketed tier
        case _ => SparkEntry.queries(name)(spark, sfDir)
      }
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
