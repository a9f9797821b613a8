package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Distributed prefix sums over a TOTAL order — the scale-safe form of
    * `sum(...) over (order by k)`: Spark plans that window as a SINGLE
    * partition (every row through one reducer — the global-window cliff),
    * whereas this runs range-repartition by the order key, a
    * partition-LOCAL running-sum window (parallel: each range partition
    * is its own window partition), and one broadcast join against the
    * per-partition offsets (a #partitions-row table computed with one
    * tiny aggregation). Results are identical to the global window for
    * any total order (`orderCols` must be ties-free — extend with a
    * tiebreaker column if not) and independent of where the range
    * boundaries happen to land (tested).
    *
    * Each (name → value expression) in `sums` yields an output column
    * `name` = running inclusive sum of that expression. */
  def prefixSums(df: DataFrame, orderCols: Seq[String],
                 sums: Seq[(String, Column)], partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val valued = df.withColumns(
      sums.map { case (nm, c) => s"__v_$nm" -> c }.toMap)
    // Materialized ONCE: the offsets branch and the join branch must see
    // the SAME physical range partitioning — repartitionByRange samples
    // its boundaries per execution, so two separate executions can place
    // boundary rows differently and the offsets would not match the
    // partitions they are added to (measured: wrong sums past the first
    // boundary at 10^5 rows).
    val ranged = valued
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // Bounded side table: one row per range partition, prefix-summed
    // over ascending pid (range partitions are ordered by construction).
    // Its global window is harmless: #partitions rows, not the data.
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy(col("__pid"))
      .agg(sum(col(s"__v_${sums.head._1}")).as(s"__t_${sums.head._1}"),
        sums.tail.map { case (nm, _) =>
          sum(col(s"__v_$nm")).as(s"__t_$nm") }: _*)
      .select(col("__pid") +:
        sums.map { case (nm, _) =>
          coalesce(sum(col(s"__t_$nm")).over(wOff), lit(0L)).as(s"__o_$nm") }: _*)
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
    val withCums = ranged.join(broadcast(offs), Seq("__pid"))
    sums.foldLeft(withCums) { case (acc, (nm, _)) =>
      acc.withColumn(nm,
        sum(col(s"__v_$nm")).over(wLocal) + col(s"__o_$nm"))
    }.drop("__pid" +: sums.flatMap { case (nm, _) =>
      Seq(s"__v_$nm", s"__o_$nm") }: _*)
  }
}
