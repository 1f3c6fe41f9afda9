package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join handling covers most
  * cases at runtime; explicit salting remains necessary when one reduce
  * key dominates an AGGREGATION (AQE cannot split a single group) or when
  * a skewed key must join a small-but-not-broadcastable side.
  */
object Salt {

  /** Two-phase skew-safe aggregation: pre-aggregate on (key, salt), then
    * merge per key. `partials` maps each wanted output to its (partial,
    * merge) expression pair — e.g. count → (count, sum of partial counts).
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partials: Seq[(String, Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val pre = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"__p_${p._1}")): _*)
    pre.groupBy(col("__key"))
      .agg(partials.head._3(s"__p_${partials.head._1}").as(partials.head._1),
        partials.tail.map(p => p._3(s"__p_${p._1}").as(p._1)): _*)
      .withColumnRenamed("__key", "key")
  }

  /** Per-row salt in [0, salts): row-unique input scattered by xxhash64, so
    * a key's rows spread ~uniformly over `salts` reduce groups regardless
    * of how skewed the key itself is. Public so specs/diagnostics can
    * measure the exact group-size distribution a salted shuffle produces.
    */
  def saltCol(salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts))

  /** Skew-safe equi-join: salt the skewed (big) side, replicate the other
    * side once per salt value, join on (key, salt). Row multiplication is
    * `salts ×` on the small side only.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated,
      saltedBig(bigKey) === replicated(smallKey) && saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
