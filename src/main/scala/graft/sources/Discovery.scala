package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table discovery by candidate probing (reference S2: `SHOW TABLES LIKE`
  * over name candidates, `/root/reference/executive_review_tool.py:113-138`).
  *
  * Works against any Hadoop-visible storage: for each candidate name, test
  * `dir/<name>.parquet`; first hit wins. Against a metastore/JDBC catalog
  * the same probe is `spark.catalog.tableExists` — the fallback-candidates
  * semantic is what carries over.
  */
object Discovery {

  /** @return (resolvedName, DataFrame) for the first existing candidate. */
  def probeTable(spark: SparkSession, dir: String, candidates: Seq[String])
      : Option[(String, DataFrame)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    candidates.iterator
      .map(n => n -> new Path(s"$dir/$n.parquet"))
      .find { case (_, p) => p.getFileSystem(conf).exists(p) }
      .map { case (n, p) => n -> spark.read.parquet(p.toString) }
  }

  /** Probing variant over a catalog (metastore/JDBC via temp views). */
  def probeCatalogTable(spark: SparkSession, candidates: Seq[String])
      : Option[(String, DataFrame)] =
    candidates.find(spark.catalog.tableExists).map(n => n -> spark.table(n))
}
