package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (optimization round): wall-time each VERB of the q237
  * standby-follower ladder (the suite's heaviest row) — foldEpoch /
  * sweep tick / followLineage / topK — so optimization lands on the
  * verb that costs, not the ladder wrapper (guide §1.2 step 1).
  */
object ProfileLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach {
      _.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k.trim, v.trim)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LADDER $label ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    import graft.operators.{Maintenance, RetrievalIndex, Snapshot}
    import graft.operators.Maintenance.{CompactPolicy, Family}
    import graft.streaming.RetrievalStream
    val rankQueries = graft.queries.CurationOps.rankQueries

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val docs = graft.core.Tables(spark, sfDir).documents
      val rix = "graft_prof_rix"; val rep2 = "graft_prof_rep"
      val path = graft.core.Scratch.path(rix + rep)
      val rpath = graft.core.Scratch.path(rep2 + rep)
      Seq(rix, rep2).foreach(t => Seq("postings", "meta", "deleted")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${t}_$s")))
      val broot = graft.core.Scratch.path(s"prof_backups$rep")
      val bfs = new org.apache.hadoop.fs.Path(broot)
      bfs.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(bfs, true)
      val famRoot = s"$broot/$rix"
      val bp = Snapshot.BackupPolicy(broot, everyBatches = 1L,
        rebaseAfterLinks = 3)
      def tick(cp: CompactPolicy, label: String): String = time(s"tick $label")(
        Maintenance.sweep(spark,
          Seq(Family(rix, "retrieval", path, backup = Some(bp))), cp)
          .collect()(0).getString(3))
      def follow(label: String): String = time(s"follow $label")(
        Snapshot.followLineage(spark, famRoot, rep2, rpath, "retrieval",
          reseed = true))
      val lenient = CompactPolicy()
      def slice(e: Long) = docs.filter(col("doc_id") % 8 === e)
      time("foldEpoch 0 (build)")(
        RetrievalStream.foldEpoch(slice(0), 0L, rix, path))
      tick(lenient, "1 full")
      follow("1 seed")
      follow("2 current")
      Seq(1L, 2L).foreach { e =>
        time(s"foldEpoch $e")(RetrievalStream.foldEpoch(slice(e), e, rix, path))
        tick(lenient, s"delta $e")
        follow(s"applied $e")
      }
      time("topK replica+primary")(
        RetrievalIndex.topK(spark, rep2, rankQueries).collect().length +
        RetrievalIndex.topK(spark, rix, rankQueries).collect().length)
      time("foldEpoch 3")(RetrievalStream.foldEpoch(slice(3), 3L, rix, path))
      tick(lenient, "rebase+prune")
      follow("reseed")
      time("foldEpoch 4")(RetrievalStream.foldEpoch(slice(4), 4L, rix, path))
      tick(lenient, "post-rebase delta")
      follow("post-rebase applied")
      time("hungry tick (compact)")(Maintenance.sweep(spark,
        Seq(Family(rix, "retrieval", path, backup = Some(bp))),
        CompactPolicy(maxBatches = 1L)).collect()(0))
      follow("current after compact")
      time("foldEpoch 5")(RetrievalStream.foldEpoch(slice(5), 5L, rix, path))
      tick(lenient, "full+prune (epoch roll)")
      follow("reseed 2")
      time("foldEpoch 6")(RetrievalStream.foldEpoch(slice(6), 6L, rix, path))
      tick(lenient, "post-roll delta")
      follow("post-roll applied")
      Seq("postings", "meta", "deleted").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS ${rix}_$s"))
      time("fsck promoted")(Maintenance.fsck(spark, rep2, "retrieval")
        .filter(!col("ok")).collect())
      time("foldEpoch 7 on replica")(
        RetrievalStream.foldEpoch(slice(7), 7L, rep2, rpath))
      time("final topK")(
        RetrievalIndex.topK(spark, rep2, rankQueries).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
