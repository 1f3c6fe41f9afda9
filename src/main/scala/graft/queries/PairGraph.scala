package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Tables

/** Per-JVM memoized access to the persisted exact-Jaccard pair graph
  * ([[graft.operators.Dedup.buildPairIndex]]) over the `documents` table
  * at a fixture dir.
  *
  * Amortization contract: the suite's near-dup consumers (q44b clusters,
  * q154 split-leakage, q155 cluster splits) all need the IDENTICAL pair
  * graph q42 generates; round 5 computed it independently in each — four
  * PPJoin runs per suite pass, ~12 s of a 138 s total at sf0.1. The first
  * consumer in a process builds the bucketed table once; the rest serve
  * from it. Every consumer keeps the SCAN-TIME SQL as its oracle, so the
  * driver's hash compare is the "index-served == scan-time" contract
  * (the q159/BM25 move applied to Jaccard). q42 itself stays scan-time:
  * the generator's cost remains an honestly-timed row, and its oracle
  * checks the generator that feeds the index.
  *
  * 100 TB shape: the pair graph is maintained state, built at ingest
  * (see [[graft.operators.Dedup.extendNearDupIndex]] for the incremental
  * encoding story); audits are table scans, never PPJoin re-runs.
  *
  * Thread-safety: computeIfAbsent builds at most once per (dir,
  * threshold) even under sbt's parallel suite execution. The table
  * registers in the JVM's shared Spark catalog (all sessions here come
  * from the same builder), into a process-scoped [[graft.core.Scratch]]
  * path — fixed within the JVM (Overwrite on rebuild, no orphaned
  * directories) and single-owner across JVMs (a parallel test fork and
  * a Verify run can no longer overwrite each other's table files).
  */
object PairGraph {
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def pairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val key = f"$dir|$threshold%.2f"
    val table = built.computeIfAbsent(key, _ => {
      val name = "graft_pairs_" + java.lang.Integer.toHexString(key.hashCode)
      val d = Tables(spark, dir).documents
        .select(col("doc_id").as("id"), col("text"))
      graft.operators.Dedup.buildPairIndex(
        d, name, graft.core.Scratch.path(name), threshold)
      name
    })
    spark.table(table)
  }
}
