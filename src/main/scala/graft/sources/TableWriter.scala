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
}
