package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical time-series diagnostics over keyed event series — the
  * signal-shape checks (serial correlation, mean-shift detection) run
  * before a sensor feed is trusted as a training signal. Inputs are
  * (user_id, ts, event_id, vm) frames with `vm` already in integer
  * milli-units; everything downstream is exact BIGINT except the single
  * quantized Pearson ratio both engines derive from identical integer
  * sufficient statistics.
  */
object TsOps {

  /** Lagged co-moment panel (ACF lags 1..3): pairs are formed WITHIN
    * each key's time-ordered series (a cross-user pair is meaningless),
    * then pooled into one corpus-wide panel per lag. The integer
    * sufficient statistics (n, Σx, Σy, Σxy, Σxx, Σyy) are the
    * hash-exact core; `acf` is the Pearson ratio computed from those
    * BIGINTs with a fixed DOUBLE expression tree, quantized to 4 dp
    * (NULL when a lag has no variance — both engines' x/0).
    *
    * Scale shape: one user-partitioned window sort (never a global
    * window), then a 3-row hash-agg with map-side combine — the panel
    * is O(1) output regardless of corpus size. */
  def autocorr(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val lagged = ev.select(col("vm").as("x"),
      lag(col("vm"), 1).over(w).as("y1"),
      lag(col("vm"), 2).over(w).as("y2"),
      lag(col("vm"), 3).over(w).as("y3"))
    val pairs = lagged
      .select(col("x"),
        posexplode(array(col("y1"), col("y2"), col("y3")))
          .as(Seq("li", "y")))
      .filter(col("y").isNotNull)
      .select((col("li") + 1).cast("int").as("lag_k"), col("x"), col("y"))
    pairs.groupBy(col("lag_k")).agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("y") * col("y")).as("sum_yy"))
      .select(col("lag_k"), col("n_pairs"), col("sum_x"), col("sum_y"),
        col("sum_xy"), col("sum_xx"), col("sum_yy"), acfRatio.as("acf"))
  }

  /** Pearson ratio from the BIGINT sufficient statistics, NULL when a
    * lag has no variance — the explicit guard mirrors DuckDB's
    * NULL-on-zero-divisor double division (Spark's ANSI default
    * throws instead). */
  private def acfRatio = {
    val num =
      col("n_pairs").cast("double") * col("sum_xy").cast("double") -
        col("sum_x").cast("double") * col("sum_y").cast("double")
    val den =
      sqrt((col("n_pairs").cast("double") * col("sum_xx").cast("double") -
            col("sum_x").cast("double") * col("sum_x").cast("double")) *
           (col("n_pairs").cast("double") * col("sum_yy").cast("double") -
            col("sum_y").cast("double") * col("sum_y").cast("double")))
    SimOps.quant4(when(den === 0.0, lit(null)).otherwise(num / den))
  }

  /** Per-user CUSUM mean-shift scan: S_t = Σ_{i≤t} (x_i − μ_user) with
    * μ the floor-divided integer mean (so S is pure integer), peak =
    * the row maximizing |S| (ties → earliest, a total order), flagged
    * when the peak exceeds 1/`peakDivisor` of the user's total
    * absolute-deviation mass — an integer concentration test: random
    * fluctuation peaks at O(√n·mad), far below n·mad/4, while a
    * mid-series mean shift concentrates ~half the mass on one side.
    *
    * Scale shape: every window is user-partitioned (one exchange, the
    * sorts shared); no global window, no self-join; one row per user
    * out. */
  def cusum(ev: DataFrame, peakDivisor: Int): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy(col("user_id"))
      .orderBy(abs(col("s")).desc, col("ts"), col("event_id"))
    ev
      .withColumn("n_readings", count(lit(1)).over(wAll))
      .withColumn("__sv", sum(col("vm")).over(wAll))
      .withColumn("mean_milli", expr("__sv div n_readings"))
      .withColumn("dev", col("vm") - col("mean_milli"))
      .withColumn("s", sum(col("dev")).over(wRun))
      .withColumn("sum_abs_dev", sum(abs(col("dev"))).over(wAll))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_readings"), col("mean_milli"),
        col("s").as("peak_cusum_milli"),
        col("event_id").as("peak_event_id"),
        (abs(col("s")) > expr(s"sum_abs_dev div $peakDivisor"))
          .as("is_shift"))
  }
}
