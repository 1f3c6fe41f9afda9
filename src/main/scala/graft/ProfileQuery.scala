package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): run named queries under a
  * scheduler listener and report, per run, the wall time alongside
  * job / stage / task counts and the SUM of task run times. The gap
  * between wall time and summed task time (divided by cores) is
  * driver-side cost — scheduling, planning, catalog and commit
  * protocol — which is invisible in `.explain` but dominates
  * metadata-heavy ladders. Guide §1 (measure first) + §7.3.
  *
  * Usage: sbt "runMain graft.ProfileQuery q237_standby_follower ..."
  * Optional SPARK_GRAFT_PROFILE_CONF="k=v;k=v" applies session confs
  * (A/B harness for scale-adaptive settings without editing Bench).
  */
object ProfileQuery {
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

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    // per-stage aggregation: (name, nTasks, sumTaskMs, deserMs, writeMs)
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int,
      (String, AtomicInteger, AtomicLong, AtomicLong)]
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]
    val jobSites = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')
          .split(" at ").last).getOrElse("?")
        jobSites.computeIfAbsent(site, _ => new AtomicInteger).incrementAndGet()
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stageName.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) {
          taskMs.addAndGet(e.taskInfo.duration)
          val key = stageName.getOrDefault(e.stageId, "?").split(" at ").last
          val agg = stageAgg.computeIfAbsent(e.stageId,
            _ => (key, new AtomicInteger, new AtomicLong, new AtomicLong))
          agg._2.incrementAndGet(); agg._3.addAndGet(e.taskInfo.duration)
          if (e.taskMetrics != null)
            agg._4.addAndGet(e.taskMetrics.executorDeserializeTime)
        }
        if (e.taskMetrics != null) gcMs.addAndGet(e.taskMetrics.jvmGCTime)
      }
    })

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val qmap = SparkEntry.queries
    val unknown = args.filterNot(qmap.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    // poor man's driver profiler: sample the query-driving thread's
    // stack every ~15 ms and histogram the deepest "interesting" frame,
    // so the fixed per-job latency decomposes into planning / listing /
    // commit / waiting-on-tasks (guide §7.3, in-process)
    val hist = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            // whole-process CPU profile: count only RUNNABLE frames, so
            // the histogram is where cycles go, not where threads wait
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                !t.getName.contains("profile-sampler")) {
              val tag = classify(st)
              if (tag != null)
                hist.computeIfAbsent(tag, _ => new AtomicInteger).incrementAndGet()
            }
          }
        }
        Thread.sleep(15)
      }
    }, "profile-sampler")
    sampler.setDaemon(true); sampler.start()

    args.foreach { name =>
      var best = Double.MaxValue
      (1 to reps).foreach { rep =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); gcMs.set(0)
        stageAgg.clear(); stageName.clear(); jobSites.clear()
        hist.clear(); sampling = rep == reps
        val t0 = System.nanoTime()
        qmap(name)(spark, sfDir).count()
        sampling = false
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"PROFILE $name rep$rep wall=$dt%7.2fs jobs=${jobs.get}%4d " +
          f"stages=${stages.get}%4d tasks=${tasks.get}%6d " +
          f"taskSum=${taskMs.get / 1e3}%8.2fs gc=${gcMs.get / 1e3}%6.2fs")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
      }
      println(f"PROFILE $name BEST $best%.2f s")
      import scala.jdk.CollectionConverters._
      // group the LAST rep's stages by call-site name
      stageAgg.asScala.values.groupBy(_._1).map { case (site, as) =>
        (site, as.size, as.map(_._2.get).sum, as.map(_._3.get).sum,
          as.map(_._4.get).sum)
      }.toSeq.sortBy(-_._4).take(12).foreach { case (site, ns, nt, ms, dms) =>
        println(f"PROFILE $name   STAGE $site: $ns%3d stages $nt%5d tasks " +
          f"${ms / 1e3}%7.2fs taskTime (deser ${dms / 1e3}%5.2fs)")
      }
      jobSites.asScala.toSeq.sortBy(-_._2.get).take(20).foreach { case (site, n) =>
        println(f"PROFILE $name   JOBS ${n.get}%4d from $site")
      }
      val total = hist.asScala.values.map(_.get).sum.max(1)
      hist.asScala.toSeq.sortBy(-_._2.get).take(14).foreach { case (tag, n) =>
        println(f"PROFILE $name   ${n.get * 100.0 / total}%5.1f%% $tag")
      }
    }
    spark.stop()
  }

  /** Map a driver stack to a coarse cost bucket; the order of checks is
    * most-specific-first.
    */
  private def classify(st: Array[StackTraceElement]): String = {
    val s = st.map(e => e.getClassName + "." + e.getMethodName)
    def has(frag: String) = s.exists(_.contains(frag))
    if (s.isEmpty) null
    else if (s.head.startsWith("java.net") || s.head.contains("Socket") ||
      s.head.contains("epoll") || s.head.contains("kqueue") ||
      s.head.contains("Unsafe.park") || s.head.contains("Object.wait") ||
      s.head.contains("FileDispatcherImpl")) null // io/park noise in RUNNABLE
    else if (has("TaskRunner") || has("Executor$TaskRunner"))
      if (has("ParquetOutputWriter") || has("FileFormatDataWriter")) "task:parquet-write"
      else if (has("FileScanRDD") || has("ParquetFileFormat")) "task:parquet-read"
      else if (has("ShuffleWriter") || has("ShuffleWriteProcessor")) "task:shuffle-write"
      else if (has("ShuffleBlockFetcher") || has("ShuffleReader")) "task:shuffle-read"
      else if (has("WholeStageCodegen") || has("GeneratedClass")) "task:codegen-exec"
      else if (has("TaskDeserialization") || has("Task$.deserializeWithDependencies") ||
        has("deserialize")) "task:deser"
      else "task:other"
    else if (has("InMemoryFileIndex") || has("listLeafFiles")) "driver:file-listing"
    else if (has("ParquetFileFormat.inferSchema") || has("readParquetFootersInParallel"))
      "driver:parquet-footers"
    else if (has("CodeGenerator") || has("janino")) "driver:codegen"
    else if (has("commitJob") || has("FileCommitProtocol")) "driver:commit"
    else if (has("SessionCatalog") || has("HiveExternalCatalog") ||
      has("InMemoryCatalog") || has("createTable") || has("alterTable"))
      "driver:catalog"
    else if (has("Optimizer") || has("RuleExecutor") || has("Analyzer") ||
      has("QueryPlanningTracker")) "driver:plan-rules"
    else if (has("QueryExecution") || has("SparkPlanner")) "driver:planning"
    else if (has("BroadcastExchangeExec")) "driver:broadcast"
    else if (has("DataSource") || has("saveAsTable") || has("insertInto"))
      "driver:datasource-resolve"
    else {
      // unmatched: name the graft call-site AND the topmost busy frame,
      // so driver CPU inside operator bodies decomposes further
      val site = s.find(_.startsWith("graft")).getOrElse("")
      val top = s.take(10).find(f => !f.startsWith("java.") &&
        !f.startsWith("jdk.") && !f.startsWith("scala."))
        .getOrElse(s.headOption.getOrElse("?"))
      if (site.nonEmpty) s"$top  [in $site]" else top
    }
  }
}
