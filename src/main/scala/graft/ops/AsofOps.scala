package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join: for each left row, the single
  * right row with the greatest `rightTime` <= `leftTime` within the same
  * key — the temporal-lookup primitive behind feature-store joins,
  * changelog/state reconstruction, and SCD lookups.
  *
  * Scale design — the union+window shape, NOT a range join:
  *  - A range-condition join (`l.key = r.key AND r.t <= l.t` + keep max)
  *    explodes to every (left, earlier-right) pair before pruning —
  *    quadratic per key. Here both sides are tagged and unioned, then one
  *    window pass per key carries the running `last(right payload,
  *    ignoreNulls)` forward in time order: ONE shuffle by key, one sort,
  *    zero join nodes, output exactly |left| rows.
  *  - Right rows sort before left rows at equal timestamps, so a state
  *    change taking effect AT t is visible to a left row at t (inclusive
  *    <=, matching DuckDB's `ASOF JOIN ... ON r.t <= l.t`).
  *  - Left rows before any right row get NULL payload (left-join
  *    semantics).
  *
  * Determinism: if the right side can hold several rows per (key, time),
  * pre-reduce it (e.g. [[EgvOps.latestByKey]] or a groupBy) — "the"
  * as-of match is otherwise ill-defined in any engine.
  */
object AsofOps {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftPayload =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTime).toSeq
    val rType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lType = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(rType(c)).as(s"__r_$c")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(lType(c)).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("*") +: rightPayload.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__side") === 1)
      .select(keyCols.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }

  /** Forward as-of: for each left row, the single right row with the
    * SMALLEST `rightTime` >= `leftTime` in the key — "the next reading
    * at or after t" (scheduling lookups, next-maintenance windows,
    * forward feature leakage checks). Same union+one-window shape as
    * [[asofJoin]], run in DESCENDING time order so the frame stays
    * unboundedPreceding → currentRow — the frame Spark evaluates
    * incrementally in O(n) per key (a currentRow → unboundedFollowing
    * frame re-scans the partition tail per row: O(n²)). Scanning down
    * in time, `last(right payload, ignoreNulls)` is the most recently
    * seen right = the smallest rightTime still >= the current left time.
    * Right rows sort before left rows at equal timestamps (inclusive
    * >=). Zero join nodes, |left| rows.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String,
                      rightPayload: Seq[String]): DataFrame = {
    val leftPayload =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTime).toSeq
    val rType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lType = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(rType(c)).as(s"__r_$c")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(c => lit(null).cast(lType(c)).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    // Descending time; at equal __t the right row (side 1) sorts first.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("*") +: rightPayload.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__side") === 0)
      .select(keyCols.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }
}
