package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training data — the concat-and-chunk model:
  * documents are concatenated in canonical (ascending id) order and the
  * token stream is cut into fixed-`budget` training sequences. Each
  * document's placement is a pure function of the GLOBAL exclusive prefix
  * sum of token counts — the one genuinely sequential quantity in a
  * curation pipeline.
  *
  * The prefix sum is a two-pass distributed scan: range-repartition by id
  * + in-partition sort, per-partition subtotals collected to the driver
  * (ONE long per partition), then a second partition-local pass that adds
  * each partition's base offset. A `sum() over (order by id)` window
  * computes the same numbers but funnels the entire corpus through a
  * single task; the scan keeps both passes fully parallel and moves only
  * `numPartitions` longs to the driver, so it survives a 100 TB corpus.
  * (Same reasoning as the sort + zipWithIndex id assignment in
  * [[graft.pipeline.ExecutiveDedupPipeline]].)
  */
object Packing {

  /** @param docs   columns `id` (long, unique) and `wt` (long >= 0, the
    *               document's token count)
    * @param budget tokens per training sequence, >= 1
    * @return (id, wt, off, first_seq, last_seq, n_seqs):
    *          - off       exclusive prefix sum of wt in ascending-id order
    *          - first_seq / last_seq  sequence indices of the doc's first /
    *            last token (null for empty docs — they occupy no sequence)
    *          - n_seqs    sequences this doc's tokens touch (> 1 means the
    *            doc crosses a training-sequence boundary)
    */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    require(budget >= 1, s"sequence budget must be >= 1, got $budget")
    val spark = docs.sparkSession

    // Enforce the wt contract distributedly BEFORE the scan passes: a NULL
    // weight (nullable input, failed cast) would NPE in getLong below, and
    // a negative one would silently corrupt every later document's offset
    // (and floorDiv's subtract-remainder identity assumes off >= 0) —
    // fail loudly instead.
    val checked = docs.select(col("id").cast(LongType).as("id"),
      when(col("wt").isNull || col("wt") < 0,
        raise_error(concat_ws(" ", lit("Packing: wt must be a non-negative number; id"),
          col("id").cast("string"), lit("has"), col("wt").cast("string"))))
        .otherwise(col("wt").cast(LongType)).as("wt"))

    // Pin ONE partition layout: both scan passes below must see the same
    // row -> partition assignment (range partitioning samples boundaries,
    // so an un-materialized plan could re-draw them between passes).
    // localCheckpoint (not persist) on purpose: if blocks were evicted and
    // recomputed between the passes, a re-drawn layout would corrupt
    // offsets SILENTLY — checkpoint turns that into a loud job failure.
    // The pinned RDD lives until the session's persistent-RDD sweep (the
    // bench harness runs one per query); callers looping packSequences
    // within one session should sweep likewise.
    val sorted = checked
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint()

    val rdd = sorted.rdd
    // pass 1: one subtotal per partition to the driver (bounded metadata)
    val partTotals = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val bases = spark.sparkContext.broadcast(partTotals.scanLeft(0L)(_ + _))

    // pass 2: partition-local running sum on top of the partition base
    val withOff = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var off = bases.value(pid)
      it.map { r =>
        val o = off
        off += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), o)
      }
    }
    val offsets = spark.createDataFrame(
      withOff,
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("wt", LongType, nullable = false),
        StructField("off", LongType, nullable = false))))

    // exact long floor-division (off >= 0): subtract the remainder first so
    // the double division is a whole number — no FP-rounding exposure
    def floorDiv(c: org.apache.spark.sql.Column) =
      ((c - c % budget) / budget).cast(LongType)
    val first = floorDiv(col("off"))
    val last = floorDiv(col("off") + col("wt") - 1)
    offsets
      .withColumn("first_seq", when(col("wt") > 0, first))
      .withColumn("last_seq", when(col("wt") > 0, last))
      .withColumn("n_seqs", when(col("wt") > 0, last - first + 1).otherwise(0L))
  }

  /** Running (inclusive) maximum of `v` in ascending `id` order — the
    * second member of the sequential-scan family: the same two-pass
    * range-partitioned shape as [[packSequences]] (pass 1: one
    * per-partition max to the driver, bounded metadata; pass 2:
    * partition-local scan seeded with the prefix max), so an inherently
    * ordered computation never funnels through a single-task global
    * window. Same layout-pinning rule: the sorted frame is
    * localCheckpointed so both passes see identical partition
    * boundaries, loudly.
    *
    * NULLs in either column fail loudly (the packSequences wt rule):
    * a NULL id has no position in the order and a NULL value would
    * NPE mid-scan.
    *
    * @return (id, v, run_max) with run_max = max of v over all rows
    *         with id' <= id
    */
  def runningMax(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    // guard AFTER the cast: a non-null value the cast nulls out (junk
    // string, out-of-range decimal) must hit the same loud error as an
    // original NULL, not a bare executor NPE mid-scan
    def longOrDie(c: String, what: String) = {
      val casted = col(c).cast(LongType)
      when(casted.isNull,
        raise_error(concat_ws(" ",
          lit(s"runningMax: $what must be a non-null long; got"),
          coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(casted)
    }
    val checked = df.select(
      longOrDie(idCol, "id").as("id"),
      longOrDie(valueCol, "value").as("v"))
    val sorted = checked
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint()
    val rdd = sorted.rdd
    val partMax = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var m = Long.MinValue
        it.foreach(r => m = math.max(m, r.getLong(1)))
        Iterator((pid, m))
      }
      .collect().sortBy(_._1).map(_._2)
    val bases = sorted.sparkSession.sparkContext.broadcast(
      partMax.scanLeft(Long.MinValue)(math.max))
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var m = bases.value(pid)
      it.map { r =>
        m = math.max(m, r.getLong(1))
        Row(r.getLong(0), r.getLong(1), m)
      }
    }
    sorted.sparkSession.createDataFrame(
      out,
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", LongType, nullable = false),
        StructField("run_max", LongType, nullable = false))))
  }

  /** DuckDB twin of [[packSequences]] over a (id, wt) relation named
    * `rel` — the window cumsum formulation (fine at oracle scale).
    */
  def packSequencesSql(rel: String, budget: Long): String = s"""
    WITH o AS (
      SELECT id, wt,
             CAST(COALESCE(SUM(wt) OVER (ORDER BY id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM ($rel))
    SELECT id, wt, off,
           CASE WHEN wt > 0 THEN CAST((off - (off % $budget)) / $budget AS BIGINT) END AS first_seq,
           CASE WHEN wt > 0 THEN CAST(((off + wt - 1) - ((off + wt - 1) % $budget)) / $budget AS BIGINT) END AS last_seq,
           CAST(CASE WHEN wt > 0
                THEN ((off + wt - 1) - ((off + wt - 1) % $budget)) / $budget
                     - (off - (off % $budget)) / $budget + 1
                ELSE 0 END AS BIGINT) AS n_seqs
    FROM o""".trim
}
