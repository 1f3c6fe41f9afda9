package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the q28-q31 shared pipeline (partPairs →
  * connected components → consolidation) so optimization targets the stage
  * that actually costs, not the one that looks quadratic.
  */
object ProfileRefOps {
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
      val n = time("partPairs(85).count")(
        queries.ReferenceOps.partPairs(spark, sfDir, 85.0).count())
      println(s"  pairs: $n")
      cleanup()
      val edges = queries.ReferenceOps.partPairs(spark, sfDir, 85.0)
        .select(col("p_partkey_l").as("src"), col("p_partkey_r").as("dst"))
      val m = time("partPairs + CC.count")(
        graft.operators.ConnectedComponents.run(spark, edges).count())
      println(s"  labels: $m")
      cleanup()
      val q29 = time("full q29 (canonical-ordered)")(
        SparkEntry.queries("q29_consolidate")(spark, sfDir).count())
      println(s"  q29 rows: $q29")
      cleanup()
      val q30 = time("partPairs(75).count")(
        queries.ReferenceOps.partPairs(spark, sfDir, 75.0).count())
      println(s"  pairs75: $q30")
      cleanup()
    }
    spark.stop()
  }
}
