package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev tool: candidate-volume measurement for the containment join — how
  * many (probe, posting) matches the token equi-join enumerates before
  * dedup/verify, per stage, on the fat-vocabulary fixture corpus.
  */
object ProfileDedup2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"), col("text"))
    val threshold = 0.9

    // rebuild containment candidate stages (mirrors Dedup.containmentPairs)
    val tokens = docs.select(col("id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("shingle"))
      .localCheckpoint()
    val dict = tokens.groupBy("shingle").agg(count(lit(1)).as("df"))
      .withColumn("tok", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("df").asc, col("shingle").asc)))
      .select("shingle", "tok")
    val enc0 = tokens.join(broadcast(dict), "shingle")
      .groupBy("id").agg(array_sort(collect_list(col("tok"))).as("toks"))
    val groups = enc0.groupBy(col("toks"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("n"))
      .localCheckpoint()
    println(s"docs: ${docs.count()}, distinct sets (reps): ${groups.count()}")

    val enc = groups.select(col("rep").as("id"), col("toks"))
      .withColumn("setsize", size(col("toks")))
      .localCheckpoint()
    val prefixLen = (col("setsize") -
      ceil(lit(threshold) * col("setsize") - lit(1e-9)) + 1).cast("int")
    val probe = enc
      .select(col("id").as("id_a"), col("setsize").as("sz_a"),
        posexplode(slice(col("toks"), lit(1), prefixLen)).as(Seq("p", "tok")))
      .select(col("id_a"), col("sz_a"), (col("p") + 1).as("rn_a"), col("tok"))
    val index = enc
      .select(col("id").as("id_b"), col("setsize").as("sz_b"),
        posexplode(col("toks")).as(Seq("p", "tok")))
      .select(col("id_b"), col("sz_b"), (col("p") + 1).as("rn_b"), col("tok"))
    println(s"probe rows: ${probe.count()}, index rows: ${index.count()}")

    val needOverlap = ceil(lit(threshold) * col("sz_a") - lit(1e-9))
    val joined = probe.join(index,
      probe("tok") === index("tok") && col("id_a") =!= col("id_b") &&
        col("sz_b").cast(DoubleType) >= lit(threshold) * col("sz_a") - lit(1e-9) &&
        lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >= needOverlap)
    val t0 = System.nanoTime()
    val raw = joined.count()
    println(f"raw matches: $raw (join took ${(System.nanoTime() - t0) / 1e9}%.2f s)")
    val t1 = System.nanoTime()
    val cand = joined.select("id_a", "id_b").dropDuplicates("id_a", "id_b").count()
    println(f"distinct candidates: $cand (join+dedup ${(System.nanoTime() - t1) / 1e9}%.2f s)")
    spark.stop()
  }
}
