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

  /** Nearest as-of: for each left row, the right row minimizing
    * |rightTime − leftTime| within the key — backward wins exact-distance
    * ties (and Δ=0 matches are backward by the inclusive rule). The
    * third ASOF mode beside [[asofJoin]] (backward) and
    * [[asofJoinForward]]; pandas' `merge_asof(direction='nearest')`,
    * which neither Spark nor DuckDB has natively.
    *
    * Shape: ONE union + TWO window passes over the SAME key
    * partitioning — an ascending scan carrying the latest right at-or-
    * before, a descending scan carrying the earliest right at-or-after
    * (both frames unboundedPreceding → currentRow, the O(n) incremental
    * form) — then a per-row pick by integer second distance. One
    * exchange, two sorts, zero join nodes, |left| output rows. Distances
    * compare in floored seconds (CAST(ts AS LONG)), matching the oracle's
    * floor(epoch()) exactly.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String,
                      rightPayload: Seq[String]): DataFrame = {
    val leftPayload =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTime).toSeq
    val rType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lType = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val carried = "__rt" +: rightPayload
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rType(rightTime)).as("__r___rt")) ++
        rightPayload.map(c => lit(null).cast(rType(c)).as(s"__r_$c")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(lType(c)).as(c)) ++
        Seq(col(rightTime).as("__r___rt")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    // Right rows (side 0) sort before left rows at equal time in BOTH
    // scans, so a Δ=0 right is visible to each and backward wins the tie.
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = l.unionByName(r)
      .select(col("*") +:
        (carried.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(wB).as(s"__b_$c")) ++
         carried.map(c =>
           last(col(s"__r_$c"), ignoreNulls = true).over(wF).as(s"__f_$c"))): _*)
      .filter(col("__side") === 1)
    val lt = col("__t").cast("long")
    val bt = col("__b___rt").cast("long")
    val ft = col("__f___rt").cast("long")
    val pickB = when(col("__f___rt").isNull, true)
      .when(col("__b___rt").isNull, false)
      .otherwise(lt - bt <= ft - lt)
    scanned
      .select(keyCols.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++ rightPayload.map(c =>
          when(pickB, col(s"__b_$c")).otherwise(col(s"__f_$c"))
            .as(s"asof_$c")): _*)
  }

  /** Tolerance-bounded backward as-of — pandas
    * `merge_asof(tolerance=...)`, the fourth mode beside backward /
    * forward / nearest: the latest right row at-or-before each left row,
    * DISCARDED (all payload columns → NULL) when it is staler than
    * `toleranceSec`. The staleness bound is what makes point-in-time
    * feature joins leak-proof AND fresh: a feature computed 3 days ago
    * must not decorate a reading that expects a 5-minute-fresh state.
    *
    * Implementation: exactly [[asofJoin]] (one exchange, zero join
    * nodes) plus a scalar freshness predicate over the carried match
    * time — staleness compares in floored epoch seconds, the engine-
    * exact integer arithmetic every temporal operator here uses.
    * `rightPayload` must include `rightTime` (the match time is what
    * freshness is judged against, and the caller sees it NULLed too).
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
                        keyCols: Seq[String], leftTime: String,
                        rightTime: String, rightPayload: Seq[String],
                        toleranceSec: Long): DataFrame = {
    require(rightPayload.contains(rightTime),
      s"rightPayload must carry $rightTime for the staleness test")
    val base = asofJoin(left, right, keyCols, leftTime, rightTime,
      rightPayload)
    val fresh = col(leftTime).cast("long") -
      col(s"asof_$rightTime").cast("long") <= lit(toleranceSec)
    // Null EXACTLY the asof output columns this join produced — a left
    // column that happens to be named asof_* must pass through untouched.
    val asofCols = rightPayload.map(c => s"asof_$c").toSet
    val kept = base.columns.map {
      case c if asofCols.contains(c) =>
        when(fresh, col(c)).as(c)
      case c => col(c)
    }
    base.select(kept.toSeq: _*)
  }

  /** Banded (grid-bucketized) interval join: every (left, right) pair in
    * the same key with |l.time − r.time| ≤ `toleranceSec`, joined EQUI on
    * (key, time-bucket) instead of key alone.
    *
    * Why the band matters at 100 TB: the plain form (`l.key = r.key` +
    * range post-filter) is an equi-join on key, so ONE hot key (a
    * celebrity user, a default device id) makes its join group
    * |l_k|·|r_k| — quadratic in the key's row count no matter how narrow
    * the time window is, and AQE's skew split cannot help because the
    * blow-up happens inside the join, not in the input partition sizes.
    * Bucketing time into `toleranceSec`-wide cells and joining on
    * (key, cell) caps each group at the rows falling in ONE cell — the
    * pair cost becomes (rows per key per tolerance window)², i.e. bounded
    * by data DENSITY, not key popularity. This is the batch shape of the
    * watermarked stream-stream interval join (both sides' state keyed by
    * time band).
    *
    * Mechanics: each left row replicates to its bucket and both
    * neighbors (bucket width = tolerance, so a match can only be in
    * b−1/b/b+1 — 3× the left side, the standard banding overhead);
    * right rows keep their single bucket, so every qualifying pair
    * appears EXACTLY once (no dedup pass). The exact |Δt| ≤ tolerance
    * predicate runs as a post-join filter. Output: all left columns plus
    * `rightPayload` (right's time surfaced as `r_<rightTime>`) and
    * `delta_s` = r.time − l.time in seconds (epoch-truncated BIGINT).
    */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame,
                         keyCols: Seq[String], leftTime: String,
                         rightTime: String, rightPayload: Seq[String],
                         toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0, "toleranceSec must be positive")
    val l = left
      .withColumn("__les", col(leftTime).cast("long"))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__b", expr(s"__les div $toleranceSec") + col("__off"))
    val r = right.select(
        keyCols.map(c => col(c).as(s"__rk_$c")) ++
          Seq(col(rightTime).cast("long").as("__res")) ++
          rightPayload.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__b", expr(s"__res div $toleranceSec"))
    l.join(r,
        keyCols.map(c => l(c) === r(s"__rk_$c")).reduce(_ && _) &&
          l("__b") === r("__b") &&
          abs(r("__res") - l("__les")) <= toleranceSec)
      .withColumn("delta_s", col("__res") - col("__les"))
      .drop((Seq("__les", "__off", "__b", "__res") ++
        keyCols.map(c => s"__rk_$c")): _*)
  }
}
