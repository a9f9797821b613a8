package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the failure mode AQE's skew-join
  * handles for sort-merge joins but which needs explicit salting when a
  * hot key must flow through a hash aggregation or a broadcast-infeasible
  * join at 100 TB.
  *
  * Semantics are unchanged by construction (tested): salting only changes
  * the partitioning, never the grouping/join keys visible to the caller.
  */
object SkewOps {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. Use when one key holds so many rows
    * that even map-side partial combine leaves a single reducer hot —
    * the salt spreads the partial rows over `saltBuckets` reducers.
    *
    * `partials` maps each output column to its (partial, final) pair,
    * e.g. count → (count, sum), sum → (sum, sum), max → (max, max).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"__p_${p._1}")): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map(p => p._3(col(s"__p_${p._1}")).as(p._1)): _*)
  }

  /** Salted equi-join for a skewed LEFT side against a right side too
    * large to broadcast: the left side gets a random salt in
    * [0, saltBuckets), the right side is replicated once per salt value,
    * and the join key becomes (key, salt) — hot keys spread over
    * saltBuckets reducers at the cost of replicating the right side.
    * Row-for-row identical to the unsalted inner join (tested).
    */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedL = skewedLeft.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicatedR = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    saltedL.join(replicatedR,
        saltedL("__salt") === replicatedR("__salt") &&
          saltedL(key) === replicatedR(key))
      .drop("__salt")
      .drop(replicatedR(key))
  }
}
