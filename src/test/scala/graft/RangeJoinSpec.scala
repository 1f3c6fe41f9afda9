package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  // 300 random closed intervals over a 100k domain, spans 0–2000 — mixes
  // point intervals, bin-straddling spans, and duplicates-by-value
  private lazy val intervals = {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    (0 until 300).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, s, s + rnd.nextInt(2000))
    }.toDF("id", "s", "e")
  }

  private def naiveOverlap = {
    val a = intervals.select(col("id").as("id_a"), col("s").as("s_a"), col("e").as("e_a"))
    val b = intervals.select(col("id").as("id_b"), col("s").as("s_b"), col("e").as("e_b"))
    a.join(b, col("id_a") < col("id_b")
        && col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select(col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b"))).as("overlap"))
  }

  test("overlapPairs equals the naive theta join at several bin widths") {
    val want = naiveOverlap.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    // widths below, near, and far above the typical span — the result may
    // never depend on the gridding parameter
    for (w <- Seq(100L, 1000L, 50000L)) {
      val got = RangeJoin.overlapPairs(intervals, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"binWidth=$w: ${got.size} vs ${want.size} pairs")
    }
  }

  test("pointInInterval equals the naive theta join") {
    val rnd = new scala.util.Random(13)
    import spark.implicits._
    val points = (0 until 500).map(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("id", "p")
    val naive = points.select(col("id").as("point_id"), col("p"))
      .join(intervals.select(col("id").as("interval_id"), col("s"), col("e")),
        col("s") <= col("p") && col("p") <= col("e"))
      .select("point_id", "interval_id", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty)
    val got = RangeJoin.pointInInterval(points, intervals, 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
  }

  test("binned plans contain no cartesian / nested-loop join") {
    for (df <- Seq(
      RangeJoin.overlapPairs(intervals, 1000L),
      RangeJoin.pointInInterval(
        intervals.select(col("id"), col("s").as("p")), intervals, 1000L))) {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }
}
