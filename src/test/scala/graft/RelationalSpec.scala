package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    for (q <- queries.Relational.all) {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name}: empty schema")
      assert(df.count() > 0, s"${q.name}: no rows")
    }
  }

  test("q01 aggregates are exact") {
    val df = queries.Relational.all.find(_.name == "q01_pricing_summary").get
      .run(spark, sfDir)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val filtered = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp")).count()
    assert(total == filtered)
  }

  test("q06 ranks are within 1..3 and unique per customer") {
    val df = queries.Relational.all.find(_.name == "q06_window_top_orders").get
      .run(spark, sfDir)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
    val dup = df.groupBy("o_custkey", "rn").count().filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("q07 anti join returns only customers without recent orders") {
    val df = queries.Relational.all.find(_.name == "q07_customers_without_orders").get
      .run(spark, sfDir)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    val bad = df.join(o, col("c_custkey") === col("o_custkey"), "inner").count()
    assert(bad == 0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
