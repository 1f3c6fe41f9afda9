package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the shingle/dedup kernels shared by
  * q42/q43/q44b/q71 (encodedSets dictionary build, PPJoin, containment).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val docs = graft.core.Tables(spark, sfDir).documents
        .select(col("doc_id").as("id"), col("text"))

      // encodedSets stages, inlined (mirrors Dedup.encodedSets)
      val tokens = time("tokens explode + localCheckpoint")(
        docs.select(col("id"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("shingle"))
          .localCheckpoint())
      println(s"  token rows: ${tokens.count()}")
      val dict = time("dict groupBy+window build")(
        tokens.groupBy("shingle").agg(count(lit(1)).as("df"))
          .withColumn("tok", row_number().over(
            Window.orderBy(col("df").asc, col("shingle").asc)))
          .select("shingle", "tok").localCheckpoint())
      println(s"  vocab: ${dict.count()}")
      val enc = time("encode join + collect_list")(
        tokens.join(broadcast(dict), "shingle")
          .groupBy("id").agg(array_sort(collect_list(col("tok"))).as("toks"))
          .localCheckpoint())
      println(s"  docs encoded: ${enc.count()}")
      cleanup()

      time("q42 full")(SparkEntry.queries("q42_jaccard_pairs")(spark, sfDir).count())
      cleanup()
      time("q71 full")(SparkEntry.queries("q71_containment_pairs")(spark, sfDir).count())
      cleanup()
      time("containmentPairs only")(
        graft.operators.Dedup.containmentPairs(docs, 0.9).count())
      cleanup()
    }
    spark.stop()
  }
}
