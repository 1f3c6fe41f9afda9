package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev tool: sub-stage timing of the bitset containment path. */
object ProfileDedup3 {
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

    val threshold = 0.9
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val docs = graft.core.Tables(spark, sfDir).documents
        .select(col("doc_id").as("id"), col("text"))
      val tokens = docs.select(col("id"),
          explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("shingle"))
        .localCheckpoint()
      val dict = tokens.groupBy("shingle").agg(count(lit(1)).as("df"))
        .withColumn("tok", row_number().over(Window.orderBy(col("df").asc, col("shingle").asc)))
        .select("shingle", "tok")
      val enc0 = tokens.join(broadcast(dict), "shingle")
        .groupBy("id").agg(array_sort(collect_list(col("tok"))).as("toks"))
      val enc = time("encode+checkpoint")(
        enc0.withColumn("setsize", size(col("toks"))).localCheckpoint())

      val vocab = enc.agg(max(element_at(col("toks"), -1))).head().getInt(0)
      val nWords = (vocab + 63) >> 6
      println(s"  vocab=$vocab nWords=$nWords")
      val bits = graft.functions.VectorExpressions.toBitset(col("toks"), nWords)
      val prefixLen = (col("setsize") -
        ceil(lit(threshold) * col("setsize") - lit(1e-9)) + 1).cast("int")
      val probe = enc.select(col("id").as("id_a"),
        col("setsize").cast(DoubleType).as("sz_a"), bits.as("bits_a"),
        explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
      val index = enc.select(col("id").as("id_b"), col("setsize").as("sz_b"),
        explode(col("toks")).as("tok"))
      val raw = probe.join(index,
          probe("tok") === index("tok") && col("id_a") =!= col("id_b") &&
            col("sz_b").cast(DoubleType) >= lit(threshold) * col("sz_a") - lit(1e-9))
        .select("id_a", "id_b", "sz_a", "bits_a")
      time("raw join (bits carried) count")(println("  raw: " + raw.count()))

      val bside = broadcast(enc.select(col("id").as("id_b"), bits.as("bits_b")))
      val verified = raw.join(bside, "id_b")
        .withColumn("containment",
          graft.functions.VectorExpressions.bitsetAndCount(col("bits_a"), col("bits_b"))
            .cast(DoubleType) / col("sz_a"))
        .filter(col("containment") >= threshold)
        .select(col("id_a"), col("id_b"), col("containment"))
      time("verify inline count")(println("  verified: " + verified.count()))
      time("verify + distinct")(println("  pairs: " +
        verified.dropDuplicates("id_a", "id_b").count()))

      // thin-join alternative: no bits through the SMJ, fetch both via bcast
      val probeThin = enc.select(col("id").as("id_a"),
        col("setsize").cast(DoubleType).as("sz_a"),
        explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
      val rawThin = probeThin.join(index,
          probeThin("tok") === index("tok") && col("id_a") =!= col("id_b") &&
            col("sz_b").cast(DoubleType) >= lit(threshold) * col("sz_a") - lit(1e-9))
        .select("id_a", "id_b", "sz_a")
      val ba = broadcast(enc.select(col("id").as("id_a"), bits.as("bits_a")))
      val thinVerified = rawThin
        .join(ba, "id_a")
        .join(bside, "id_b")
        .withColumn("containment",
          graft.functions.VectorExpressions.bitsetAndCount(col("bits_a"), col("bits_b"))
            .cast(DoubleType) / col("sz_a"))
        .filter(col("containment") >= threshold)
        .select(col("id_a"), col("id_b"), col("containment"))
      time("THIN verify + distinct")(println("  pairs: " +
        thinVerified.dropDuplicates("id_a", "id_b").count()))

      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
