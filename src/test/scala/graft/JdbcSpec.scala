package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.pipeline.IssuesPipeline
import graft.sources.JdbcSource

/** End-to-end JDBC integration over an embedded Derby catalog (the Derby
  * driver ships with Spark): candidate probing via JDBC metadata, reads
  * through `spark.read.jdbc`, predicate/projection pushdown asserted at
  * the plan level, the issues pipeline run source-to-result over a live
  * JDBC connection, and a range-partitioned parallel read — the S1/S2
  * behaviors the reference exercises against MySQL.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft_derby").resolve("db")
    val u = s"jdbc:derby:$dir;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    // reference-shaped issues table under one of the probed synonyms
    st.executeUpdate(
      """CREATE TABLE company_issues (
        |  ticker VARCHAR(16), issue VARCHAR(64),
        |  against_amount VARCHAR(32), neutral_amount VARCHAR(32),
        |  pro_amount VARCHAR(32))""".stripMargin)
    val rows = Seq(
      ("AAA", "climate", "10", "5", "85"),
      ("AAA", "pay", "60", "30", "10"),
      ("BBB", "climate", "junk", "20", "30"), // junk numeric -> 0.0
      ("bbb", "pay", "40", "40", "20"),       // lowercase ticker -> BBB
      ("", "climate", "1", "2", "3"),         // invalid ticker: filtered
      ("ZZZ", "", "1", "2", "3"),             // empty issue: filtered
      ("NOPE", "climate", "7", "7", "86"))    // unmapped ticker
    val ps = conn.prepareStatement("INSERT INTO company_issues VALUES (?,?,?,?,?)")
    rows.foreach { case (t, i, a, n, p) =>
      ps.setString(1, t); ps.setString(2, i); ps.setString(3, a)
      ps.setString(4, n); ps.setString(5, p); ps.executeUpdate()
    }
    st.executeUpdate(
      "CREATE TABLE tickers (ticker VARCHAR(16), company_id VARCHAR(32))")
    val ps2 = conn.prepareStatement("INSERT INTO tickers VALUES (?,?)")
    Seq("AAA" -> "company_a", "BBB" -> "company_b", "ZZZ" -> "company_z")
      .foreach { case (t, c) => ps2.setString(1, t); ps2.setString(2, c); ps2.executeUpdate() }
    st.executeUpdate(
      "CREATE TABLE big_scan (id INT NOT NULL, payload VARCHAR(32))")
    val ps3 = conn.prepareStatement("INSERT INTO big_scan VALUES (?,?)")
    (0 until 100).foreach { i => ps3.setInt(1, i); ps3.setString(2, s"p$i"); ps3.executeUpdate() }
    conn.close()
    u
  }

  test("catalog probing finds the first existing candidate, case-insensitively") {
    val hit = JdbcSource.probeTable(spark, url,
      Seq("issues_main", "COMPANY_ISSUES", "fallback"))
    assert(hit.isDefined, "company_issues exists under Derby's upper-cased name")
    val (name, df) = hit.get
    assert(name.equalsIgnoreCase("company_issues"))
    assert(df.count() == 7)
    assert(JdbcSource.probeTable(spark, url, Seq("nope_1", "nope_2")).isEmpty)
    val tables = JdbcSource.listTables(url).map(_.toLowerCase)
    assert(tables.contains("company_issues") && tables.contains("tickers"))
  }

  test("filters and projection push down into the JDBC scan") {
    val df = spark.read.jdbc(url, "big_scan", new java.util.Properties)
      .filter(col("id") > 90)
      .select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(ID,90)"),
      s"JDBC scan must ship the predicate to the database; plan:\n$plan")
    assert(plan.contains("ReadSchema: struct<ID: int>") || !plan.contains("PAYLOAD"),
      s"projection must prune the payload column; plan:\n$plan")
    assert(df.count() == 9)
  }

  test("issues pipeline runs end-to-end over a live JDBC source") {
    val issues = JdbcSource.probeTable(spark, url,
      Seq("issues", "company_issues")).get._2
    val tickers = spark.read.jdbc(url, "tickers", new java.util.Properties)
      .select(col("TICKER").as("ticker"), col("COMPANY_ID").as("company_id"))
    val result = IssuesPipeline.run(issues, tickers, expectedIssues = 2)

    val derived = result.derived.collect()
    // 7 rows - 2 invalid - 1 unmapped = 4 derived rows across 2 companies
    assert(derived.length == 4)
    val unmapped = result.unmappedTickers.collect().map(_.getString(0))
    assert(unmapped.sameElements(Array("NOPE")))
    val companies = result.nested.collect().map(_.getString(0)).sorted
    assert(companies.sameElements(Array("company_a", "company_b")))
    // junk numeric coerced to 0.0, not failed
    val bbbClimate = derived.find(r => r.getString(0) == "company_b"
      && r.getString(2) == "climate").get
    assert(bbbClimate.getDouble(bbbClimate.fieldIndex("against")) == 0.0)
  }

  test("range-partitioned read splits the scan into parallel disjoint queries") {
    val df = JdbcSource.readPartitioned(spark, url, "big_scan", "id",
      lowerBound = 0, upperBound = 100, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "4 range-disjoint JDBC queries")
    assert(df.count() == 100, "partition ranges must cover the whole table")
  }
}
