package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-equi range joins without the nested loop.
  *
  * Spark executes a pure range predicate (`a.s <= b.e AND b.s <= a.e`, or
  * `s <= p AND p <= e`) as a BroadcastNestedLoopJoin / cartesian product —
  * every row against every row, the same scale-killer class as an
  * all-pairs theta join. The standard fix (the shape behind production
  * "range join optimization"s) is to grid the value domain into
  * fixed-width bins: an interval registers in every bin it touches, a
  * point in exactly one, candidates come from a plain bin EQUI-join, and
  * the exact range predicate filters candidates. Cost goes from |L|×|R|
  * to Σ_bin |L_bin|×|R_bin|.
  *
  * Pair dedup is arithmetic, not a shuffle: a candidate pair would
  * surface once per shared bin, so it is kept only in the canonical bin
  * where the overlap STARTS (`bin == floor(max(s_a, s_b) / width)`) —
  * both rows of an overlapping pair are guaranteed present there, and
  * in no earlier shared bin.
  *
  * Choosing `binWidth`: ≈ the typical interval span. Much smaller →
  * long intervals explode into span/width bin rows; much larger → wide
  * bins degenerate toward all-pairs within a bin. A bin holding m
  * concurrent intervals does m² candidate work — the same hot-bucket
  * caveat as every gridding scheme (LSH buckets, blocking keys); AQE
  * splits stragglers, and a domain with one pathological hot spot wants
  * a narrower width. (Bin ids are floor(value/width) over DOUBLE
  * division — exact while |value/width| < 2^52, which epoch-second /
  * sub-day-width domains clear by six orders of magnitude.)
  */
object RangeJoin {

  private def bin(v: Column, width: Long): Column =
    floor(v / lit(width.toDouble)).cast("long")

  /** Overlapping-interval pairs: (id_a, id_b, overlap) for every pair
    * with `s_a <= e_b AND s_b <= e_a` and `id_a < id_b`; `overlap` =
    * `least(e_a, e_b) - greatest(s_a, s_b)` (0 for point-touching ends).
    * Closed intervals, `s <= e`, any long domain (epoch seconds,
    * positions, prices×100).
    *
    * @param iv (id: long, s: long, e: long)
    */
  def overlapPairs(iv: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = iv.select(col("id"), col("s"), col("e"),
      explode(sequence(bin(col("s"), binWidth), bin(col("e"), binWidth))).as("bin"))
    val l = binned.select(col("bin"), col("id").as("id_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val r = binned.select(col("bin"), col("id").as("id_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    l.join(r, Seq("bin"))
      .filter(col("id_a") < col("id_b")
        && col("s_a") <= col("e_b") && col("s_b") <= col("e_a")
        // canonical-bin guard: exactly one surviving copy per pair
        && col("bin") === bin(greatest(col("s_a"), col("s_b")), binWidth))
      .select(col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b"))).as("overlap"))
  }

  /** Point-in-interval join: every (point, covering interval) match with
    * `s <= p AND p <= e`. The point side registers in ONE bin, so no
    * dedup guard is needed — an interval contributes each of its bins
    * once.
    *
    * @param points (id: long, p: long)
    * @param iv     (id: long, s: long, e: long)
    * @return (point_id, interval_id, p)
    */
  def pointInInterval(points: DataFrame, iv: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pts = points.select(bin(col("p"), binWidth).as("bin"),
      col("id").as("point_id"), col("p"))
    val ivs = iv.select(col("id").as("interval_id"), col("s"), col("e"),
      explode(sequence(bin(col("s"), binWidth), bin(col("e"), binWidth))).as("bin"))
    pts.join(ivs, Seq("bin"))
      .filter(col("s") <= col("p") && col("p") <= col("e"))
      .select(col("point_id"), col("interval_id"), col("p"))
  }
}
