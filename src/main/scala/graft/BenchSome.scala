package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry queries with Bench's methodology
  * (min of N reps, cache/persist cleanup between runs). Usage:
  * `runMain graft.BenchSome q18_large_orders q56_ngram_stats`
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same defaults as Bench — numbers from the two tools are only
    // comparable when cores/shuffle-partitions agree
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    try args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"BENCHSOME $name UNKNOWN (not in SparkEntry.queries)")
        case Some(fn) =>
          val times = (0 until reps).map { _ =>
            val t0 = System.nanoTime()
            val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable => System.err.println(s"[$name] $e"); false }
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
            System.gc()
            if (ok) dt else Double.NaN
          }
          if (times.exists(_.isNaN)) println(s"BENCHSOME $name FAILED")
          else println(f"BENCHSOME $name min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    } finally spark.stop()
  }
}
