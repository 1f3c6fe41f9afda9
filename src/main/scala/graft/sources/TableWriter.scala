package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partition-aware parquet table writer — the layout layer a 100 TB
  * deployment depends on:
  *
  *  - `partitionBy` date/category columns → partition pruning at read time
  *    (queries touching one day scan one directory, not the corpus);
  *  - per-partition file sizing via `maxRecordsPerFile` instead of a
  *    global `repartition` (avoids one extra full shuffle);
  *  - optional sorted-within-partitions layout for run-length/delta
  *    encoding friendliness and faster min/max skipping.
  */
object TableWriter {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val laid =
      if (sortCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df
    laid.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Small-file compaction — the lake-maintenance pass every streaming or
    * incremental ingest eventually needs: micro-batches and per-task
    * writers leave thousands of KB-sized files, and at 100 TB the scan
    * cost becomes file-open overhead instead of IO. Rewrites a parquet
    * directory into ⌈measured bytes / targetBytes⌉ files via round-robin
    * `repartition(n)` (even output sizes by construction); optional
    * `sortCols` restores run-length/min-max-friendly layout in the same
    * pass. Writes to a NEW directory — the caller swaps paths after
    * verifying (e.g. with [[graft.operators.Integrity.fingerprint]],
    * which is invariant to exactly the re-layout this performs).
    *
    * @return number of output files written
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val laid =
      if (sortCols.nonEmpty) df.repartition(nFiles).sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    laid.write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }

  /** Z-order layout — multi-dimensional data skipping at WRITE time.
    *
    * A single sort key gives parquet min/max pruning on ONE column; a
    * query filtering on a different column still reads every file. Z-order
    * interleaves the bits of per-column QUANTILE buckets (quantiles, not
    * min/max scaling, so skewed columns still spread across buckets) into
    * one sort key, so each output file covers a small hyper-rectangle of
    * the value space — range filters on ANY of the z-columns prune files.
    * The classic trade: each single dimension prunes less sharply than a
    * dedicated sort, but every dimension prunes (at 100 TB, "2 of 5000
    * files for time AND user" beats "40 files for time, all 5000 for
    * user").
    *
    * Mechanics, all plan-native: per-column bucket boundaries come from
    * `approxQuantile` (driver-held, bounded: 2^bits doubles per column);
    * the bucket id is a filtered-array rank over the broadcast boundary
    * literals; bit interleave is shift/or column arithmetic (codegen'd);
    * layout is `repartitionByRange` + `sortWithinPartitions` on the z
    * value — one shuffle, same as any re-sort.
    *
    * NULL z-column values land in bucket 0 (they sort together and never
    * poison min/max stats).
    */
  def zordered(
      df: DataFrame,
      zCols: Seq[String],
      nFiles: Int,
      bits: Int = 8): DataFrame = {
    require(zCols.nonEmpty && nFiles > 0 && bits >= 2 && bits * zCols.size <= 62,
      s"need cols, files > 0, and bits*|cols| <= 62 (got $bits x ${zCols.size})")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ONE boundary pass for all z-columns (per-column approxQuantile
    // calls would scan the input |zCols| times before the write)
    val castCols = zCols.indices.map(i => s"__zq$i")
    val allBounds = df
      .select(zCols.zip(castCols).map { case (c, a) => col(c).cast("double").as(a) }: _*)
      .stat.approxQuantile(castCols.toArray, probs, 0.001)
    val zv = zCols.zipWithIndex.map { case (c, ci) =>
      val boundsArr = array(allBounds(ci).toSeq.map(lit): _*)
      val bucket = when(col(c).isNull, lit(0L))
        .otherwise(size(filter(boundsArr, b => b <= col(c).cast("double"))).cast("long"))
      (bucket, ci)
    }.foldLeft(lit(0L)) { case (acc, (bucket, ci)) =>
      (0 until bits).foldLeft(acc) { (a, j) =>
        // bucket bit j → z bit j·|cols| + ci
        a.bitwiseOR(shiftleft(bucket.bitwiseAND(lit(1L << j)),
          j * (zCols.size - 1) + ci))
      }
    }
    df.withColumn("__z", zv)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** [[zordered]] + parquet write: the Delta/Iceberg `OPTIMIZE ZORDER BY`
    * maintenance pass, minus the table format.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      nFiles: Int,
      bits: Int = 8,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    zordered(df, zCols, nFiles, bits).write.mode(mode).parquet(path)

  /** Bucketed layout — co-locate a join/aggregation key at WRITE time.
    *
    * Every equi-join or groupBy on `bucketCol` against another table
    * bucketed the same way (same column semantics, same `nBuckets`) then
    * reads pre-shuffled data: the exchange is paid ONCE at ingest instead
    * of once per query, which is the difference between "a nightly join of
    * two 100 TB fact tables shuffles 200 TB" and "it shuffles nothing".
    * `sortBy(bucketCol)` additionally lets sort-merge joins skip their
    * per-task sort. Bucketing requires the table catalog (`saveAsTable`);
    * the explicit `path` keeps the data external so the files live with
    * the rest of the lake layout rather than in the warehouse directory.
    *
    * File-count hygiene: Spark's bucketed writer emits one file per
    * (task, bucket) pair, so a 32-partition upstream frame writes up to
    * 32×nBuckets splinter files whose open cost every later scan pays —
    * forever, on an index table read per query. The repartition below
    * clusters rows by the bucket hash FIRST (HashPartitioning and
    * bucket assignment share Murmur3-mod, so partition i holds exactly
    * bucket i), collapsing the layout to one file per bucket. The
    * shuffle it costs is paid once at write; callers size `nBuckets` to
    * the table, which is also what bounds write parallelism here.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketed(df, table, path, Seq(bucketCol), nBuckets, mode)

  /** Composite-key form: bucket assignment and the pre-write
    * repartition hash the same column TUPLE (Murmur3-mod on both
    * sides), so the one-file-per-bucket hygiene holds for multi-column
    * keys exactly as for single ones.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      mode: SaveMode): Unit = {
    df.repartition(nBuckets,
        bucketCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(mode)
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
