package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the shared encoded-shingle-set pass
  * under q42/q43/q44b/q71 (the measured per-query floor), so any
  * optimization of that family targets the stage that costs.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    import graft.functions.TextFunctions
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val docs = graft.core.Tables(spark, sfDir).documents
        .select(col("doc_id").as("id"), col("text"))
      // stage 1: shingle explode alone
      val tokens = docs.select(col("id"),
        explode(TextFunctions.shingles(col("text"), 5)).as("shingle"))
      time("1 shingle explode (count)")(tokens.count())
      // stage 1b: explode + checkpoint (what encodedSets pays)
      val ckpt = time("1b explode + localCheckpoint")(tokens.localCheckpoint())
      // stage 2: dictionary groupBy + rank window
      val dict = ckpt.groupBy("shingle").agg(count(lit(1)).as("df"))
        .withColumn("tok", row_number().over(
          Window.orderBy(col("df").asc, col("shingle").asc)))
        .select("shingle", "tok")
      time("2 dict build (count)")(dict.count())
      // stage 3: join-back + collect_list + sort
      val enc = ckpt.join(broadcast(dict), "shingle")
        .groupBy("id").agg(array_sort(collect_list(col("tok"))).as("toks"))
      time("3 encode join + collect (count)")(enc.count())
      // stage 4: identical-set collapse groups over the enc
      val groups = enc.groupBy(col("toks"))
        .agg(min(col("id")).as("rep"),
          sort_array(collect_list(col("id"))).as("members"))
      time("4 collapse groups (count)")(groups.count())
      cleanup()
      // bare operators (no canonical ORDER BY) vs the full queries
      time("jaccardPairs bare")(
        graft.operators.Dedup.jaccardPairs(docs, 0.8).count())
      cleanup()
      time("minhashLsh bare")(
        graft.operators.Dedup.minhashLsh(docs, 0.8).count())
      cleanup()
      // whole queries for reference
      time("q42 full")(SparkEntry.queries("q42_jaccard_pairs")(spark, sfDir).count())
      cleanup()
      time("q43 full")(SparkEntry.queries("q43_minhash_lsh")(spark, sfDir).count())
      cleanup()
    }
    spark.stop()
  }
}
