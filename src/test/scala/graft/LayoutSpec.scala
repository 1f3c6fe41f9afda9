package graft

import org.apache.spark.sql.functions._

import graft.operators.Salt
import graft.sources.TableWriter

class LayoutSpec extends SparkSpec {

  test("partitioned write prunes partitions at read time") {
    val dir = java.nio.file.Files.createTempDirectory("tw").toString + "/events"
    val e = graft.core.Tables(spark, sfDir).events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    TableWriter.writePartitioned(e, dir, Seq("day"), sortCols = Seq("user_id"))

    val days = new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
    assert(days.length > 1, "multiple day partitions expected")

    val read = spark.read.parquet(dir).filter(col("day") === days.head.getName.stripPrefix("day="))
    val plan = read.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    assert(read.count() > 0)
  }

  test("bucketed tables equi-join with no shuffle, and agree with plain join") {
    val tmp = java.nio.file.Files.createTempDirectory("buck").toString
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    TableWriter.writeBucketed(c, "buck_customer", s"$tmp/c", "c_custkey", nBuckets = 8)
    TableWriter.writeBucketed(o, "buck_orders", s"$tmp/o", "o_custkey", nBuckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join to its at-scale shape (no broadcast escape hatch):
      // with both sides bucketed by the key, the sort-merge join must read
      // bucket files directly — zero Exchange anywhere in the plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("buck_customer")
        .join(spark.table("buck_orders"), col("c_custkey") === col("o_custkey"))
      val p = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount"), "scan must be bucket-aware: " + p)
      val plain = c.join(o, col("c_custkey") === col("o_custkey")).count()
      assert(j.count() == plain, "bucketed join must not change results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS buck_customer")
      spark.sql("DROP TABLE IF EXISTS buck_orders")
    }
  }

  test("compaction collapses a shattered table; integrity digest is unchanged") {
    import graft.operators.Integrity
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val c = graft.core.Tables(spark, sfDir).customer
    val cols = Seq(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    // shatter: 64 tiny files, the streaming-ingest pathology
    c.repartition(64).write.parquet(s"$tmp/shattered")
    def parquetFiles(dir: String) = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/shattered") == 64)

    val n = TableWriter.compact(spark, s"$tmp/shattered", s"$tmp/compacted",
      targetBytes = 1L << 20, sortCols = Seq("c_custkey"))
    assert(parquetFiles(s"$tmp/compacted") == n && n < 8, s"$n files")
    // re-layout must be invisible to the data: same order-independent digest
    val before = Integrity.fingerprint(c, cols, "t").head()
    val after = Integrity.fingerprint(
      spark.read.parquet(s"$tmp/compacted"), cols, "t").head()
    assert(after == before)
  }

  test("salted aggregation equals plain aggregation") {
    val o = graft.core.Tables(spark, sfDir).orders
    val plain = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salt.saltedAgg(
      o, col("o_custkey"), salts = 8,
      Seq(("n", count(lit(1)), (p: String) => sum(col(p)))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("hot-key fixture: salted join equals plain join AND bounds the reduce groups") {
    // 90% of the fact side is ONE key — the shape q76 diagnoses, AQE can't
    // split for aggregations, and a plain shuffle join funnels into one task
    val hot = 45000L
    val big = spark.range(50000).select(
      when(col("id") < hot, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val small = spark.range(50000).select(col("id").as("sk"), (col("id") % 97).as("attr"))

    // identical results: salting is plan surgery, not a semantics change
    def checksum(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum("v"), sum("attr")).head()
    val plain = checksum(big.join(small, col("k") === col("sk")))
    val salted = checksum(Salt.saltedJoin(big, small, "k", "sk", salts = 8))
    assert(salted == plain, s"salted=$salted plain=$plain")

    // bounded max reduce-group: after salting, the hot key's rows land in
    // `salts` distinct (key, salt) shuffle groups, so no reduce task can
    // receive more than ~hot/salts of it (vs ALL of it unsalted)
    val groups = big.withColumn("__salt", Salt.saltCol(8))
      .groupBy("k", "__salt").count()
    val maxGroup = groups.agg(max("count")).head().getLong(0)
    assert(maxGroup <= hot / 8 * 2,
      s"hot key must spread over salts: max group $maxGroup vs unsalted $hot")
    // and all 8 salt values actually receive rows of the hot key
    assert(groups.filter(col("k") === 7L).count() == 8)
  }

  test("salted join equals plain join") {
    val t = graft.core.Tables(spark, sfDir)
    val plain = t.customer.join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salt.saltedJoin(t.customer, t.nation, "c_nationkey", "n_nationkey", salts = 4)
      .groupBy("n_name").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("z-order layout: every z-dimension prunes files; content unchanged") {
    val nFiles = 16
    val ev = graft.core.Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
    val base = java.nio.file.Files.createTempDirectory("zord").toString
    // "linear" control: the same file count in the table's natural order
    ev.repartitionByRange(nFiles, col("event_id")).write.parquet(s"$base/linear")
    TableWriter.writeZOrdered(ev, s"$base/zorder", Seq("user_id", "ms"), nFiles)

    // re-layout must be content-invisible (the compaction test's rule)
    val fp = (p: String) => graft.operators.Integrity.fingerprint(
      spark.read.parquet(p), Seq(col("event_id"), col("user_id"), col("ms")), "z")
      .collect().head.toSeq
    assert(fp(s"$base/zorder") == fp(s"$base/linear"))

    // per-file min/max footprint — what a stats-based reader would prune on
    def footprints(p: String) = spark.read.parquet(p)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("ms").as("mlo"), max("ms").as("mhi"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val lin = footprints(s"$base/linear")
    val zrd = footprints(s"$base/zorder")
    assert(lin.length == nFiles && zrd.length == nFiles)

    // a 10%-selectivity range query per dimension: count candidate files
    val (uAll, mAll) = (ev.select(min("user_id"), max("user_id")).head,
      ev.select(min("ms"), max("ms")).head)
    val (uq1, uq2) = (uAll.getLong(0), uAll.getLong(0) + (uAll.getLong(1) - uAll.getLong(0)) / 10)
    val (mq1, mq2) = (mAll.getLong(0), mAll.getLong(0) + (mAll.getLong(1) - mAll.getLong(0)) / 10)
    def hitsUser(fs: Array[(Long, Long, Long, Long)]) =
      fs.count { case (ulo, uhi, _, _) => ulo <= uq2 && uhi >= uq1 }
    def hitsTime(fs: Array[(Long, Long, Long, Long)]) =
      fs.count { case (_, _, mlo, mhi) => mlo <= mq2 && mhi >= mq1 }

    // natural order is ~insertion order: user ranges span every file
    assert(hitsUser(lin) == nFiles, s"control should not prune on user: ${hitsUser(lin)}")
    // z-order prunes on BOTH dimensions (neither needs to be perfect)
    assert(hitsUser(zrd) <= nFiles / 2, s"user-range files: ${hitsUser(zrd)}")
    assert(hitsTime(zrd) <= nFiles / 2, s"time-range files: ${hitsTime(zrd)}")
  }
}
