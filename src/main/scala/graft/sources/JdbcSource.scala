package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC catalog source (reference S1/S2: the primary input is a MySQL
  * scan with `SHOW TABLES`-style name probing —
  * `/root/reference/index_align_to_firebase.py:130-153`,
  * `/root/reference/executive_review_tool.py:113-166`).
  *
  * Spark-first shape: `spark.read.jdbc` produces a JDBCRelation whose
  * filters and column projection push down INTO the database (the scan
  * ships `SELECT <cols> WHERE <preds>`, not `SELECT *`), and a partitioned
  * read splits the table into `numPartitions` range-disjoint queries so a
  * 1000-executor cluster scans in parallel instead of through one
  * connection. Catalog probing uses JDBC `DatabaseMetaData` — the portable
  * equivalent of `SHOW TABLES LIKE` — with the reference's
  * first-candidate-wins semantics, case-insensitive because engines
  * disagree on identifier folding (Derby/Oracle upper, MySQL as-is,
  * Postgres lower).
  */
object JdbcSource {

  /** All base-table names visible in the catalog. */
  def listTables(url: String, props: Properties = new Properties): Seq[String] = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(_.getString("TABLE_NAME"))
        .toList
      rs.close()
      names
    } finally conn.close()
  }

  /** First candidate that exists in the catalog (case-insensitive), read
    * as a pushdown-capable DataFrame.
    *
    * @return (resolved physical table name, DataFrame)
    */
  def probeTable(
      spark: SparkSession,
      url: String,
      candidates: Seq[String],
      props: Properties = new Properties): Option[(String, DataFrame)] = {
    val byLower = listTables(url, props).groupBy(_.toLowerCase).map {
      case (k, vs) => k -> vs.head
    }
    candidates.collectFirst {
      case c if byLower.contains(c.toLowerCase) =>
        val actual = byLower(c.toLowerCase)
        actual -> spark.read.jdbc(url, actual, props)
    }
  }

  /** Range-partitioned parallel read: `numPartitions` disjoint
    * `WHERE partitionCol BETWEEN ...` queries run concurrently, one per
    * task — the scale path for large source tables (a single-connection
    * scan is the 100 TB anti-pattern).
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lowerBound, upperBound, numPartitions, props)
}
