package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.{SimOps, TsOps}

/** Classical time-series diagnostics over the event stream — the
  * signal-shape checks (serial correlation, mean-shift detection) run
  * before a sensor feed is trusted as a training signal. Everything is
  * exact-integer milli-units except the single quantized Pearson ratio,
  * which both engines derive from the identical BIGINT sufficient
  * statistics with the identical IEEE expression tree.
  */
object TimeSeriesQueries {

  /** Largest autocorrelation lag in the panel. */
  val AcfMaxLag = 3

  /** CUSUM shift flag: peak |S| must exceed this fraction (1/4) of the
    * user's total absolute-deviation mass. Random fluctuation peaks at
    * O(√n·mad) — far below n·mad/4 for any real series length — while a
    * mid-series mean shift concentrates ~half the mass on one side. */
  val CusumPeakDivisor = 4

  val defs: Seq[QueryDef] = Seq(

    // Lagged co-moment panel (ACF lags 1..3): pairs are formed WITHIN
    // each user's time-ordered series (a cross-user pair is
    // meaningless), then pooled into one corpus-wide panel per lag. The
    // integer sufficient statistics (n, Σx, Σy, Σxy, Σxx, Σyy in
    // milli-units) are the gate's hash-exact core; acf is the Pearson
    // ratio both engines compute from those BIGINTs with the same
    // DOUBLE expression, quantized to 4 dp. Shape at 100 TB: one
    // user-partitioned window sort (no global window), then a 3-row
    // hash-agg with map-side combine — the panel is O(1) output no
    // matter the corpus.
    QueryDef("ts_autocorr",
      (s, d) => TsOps.autocorr(Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS LONG)").as("vm"))),
      Some(s"""WITH ev AS (SELECT user_id, ts, event_id,
             |   CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm FROM events),
             | l AS (SELECT vm AS x,
             |   lag(vm, 1) OVER w AS y1, lag(vm, 2) OVER w AS y2,
             |   lag(vm, 3) OVER w AS y3
             |  FROM ev WINDOW w AS (PARTITION BY user_id
             |    ORDER BY ts, event_id)),
             | p AS (SELECT 1 AS lag_k, x, y1 AS y FROM l WHERE y1 IS NOT NULL
             |  UNION ALL SELECT 2, x, y2 FROM l WHERE y2 IS NOT NULL
             |  UNION ALL SELECT 3, x, y3 FROM l WHERE y3 IS NOT NULL),
             | g AS (SELECT CAST(lag_k AS INT) AS lag_k,
             |   CAST(count(*) AS BIGINT) AS n_pairs,
             |   CAST(sum(x) AS BIGINT) AS sum_x,
             |   CAST(sum(y) AS BIGINT) AS sum_y,
             |   CAST(sum(x * y) AS BIGINT) AS sum_xy,
             |   CAST(sum(x * x) AS BIGINT) AS sum_xx,
             |   CAST(sum(y * y) AS BIGINT) AS sum_yy
             |  FROM p GROUP BY 1)
             | SELECT lag_k, n_pairs, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
             |  ${SimOps.quant4Sql(
                  "(CAST(n_pairs AS DOUBLE) * CAST(sum_xy AS DOUBLE) - " +
                  "CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE)) / " +
                  "sqrt((CAST(n_pairs AS DOUBLE) * CAST(sum_xx AS DOUBLE) - " +
                  "CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)) * " +
                  "(CAST(n_pairs AS DOUBLE) * CAST(sum_yy AS DOUBLE) - " +
                  "CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))")}
             |    AS acf
             | FROM g ORDER BY lag_k""".stripMargin.replace("\n", "")),
      presentOrder = Seq("lag_k")),

    // Per-user CUSUM mean-shift scan: S_t = Σ_{i≤t} (x_i − μ_user) in
    // exact milli-units (μ is the floor-divided mean, so S is pure
    // integer), peak = the row maximizing |S| (ties → earliest — a
    // total order), flagged when the peak exceeds 1/4 of the user's
    // absolute-deviation mass (integer compare, no σ/√n needed). This
    // is the sensor-drift detector: a re-calibrated or swapped device
    // shows as a mean shift and its peak row dates the change. Shape:
    // every window is user-partitioned (one exchange, sorts shared);
    // no global window, no self-join; output is one row per user.
    QueryDef("ts_cusum",
      (s, d) => TsOps.cusum(Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS LONG)").as("vm")),
        CusumPeakDivisor),
      Some(s"""WITH ev AS (SELECT user_id, ts, event_id,
             |   CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm FROM events),
             | b AS (SELECT user_id, ts, event_id, vm,
             |   CAST(count(*) OVER pu AS BIGINT) AS n_readings,
             |   CAST(sum(vm) OVER pu AS BIGINT)
             |     // CAST(count(*) OVER pu AS BIGINT) AS mean_milli
             |  FROM ev WINDOW pu AS (PARTITION BY user_id)),
             | dv AS (SELECT *, vm - mean_milli AS dev FROM b),
             | sc AS (SELECT *,
             |   CAST(sum(dev) OVER (PARTITION BY user_id
             |     ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             |     AS BIGINT) AS s,
             |   CAST(sum(abs(dev)) OVER (PARTITION BY user_id)
             |     AS BIGINT) AS sum_abs_dev
             |  FROM dv),
             | pk AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |   ORDER BY abs(s) DESC, ts, event_id) AS rn FROM sc)
             | SELECT user_id, n_readings, mean_milli,
             |  s AS peak_cusum_milli, event_id AS peak_event_id,
             |  abs(s) > sum_abs_dev // $CusumPeakDivisor AS is_shift
             | FROM pk WHERE rn = 1 ORDER BY user_id""".stripMargin
               .replace("\n", "")),
      presentOrder = Seq("user_id")),

    // Theil–Sen robust trend per user over the trailing 16 readings:
    // lower median of the 120 pairwise index slopes in exact integer
    // micro-milli per step — the outlier-immune replacement for the OLS
    // trend (one glitch reading breaks OLS; the pairwise median has a
    // 29% breakdown point). Floor division is spelled via the explicit
    // nonneg-residue identity because Spark div truncates while DuckDB
    // // floors — they disagree precisely on negative slopes.
    QueryDef("ts_theil_sen",
      (s, d) => TsOps.theilSen(Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS LONG)").as("vm")),
        window = 16),
      Some(TsOps.theilSenSql("events", window = 16)),
      presentOrder = Seq("user_id")),

    // Holt double-exponential smoothing: level + trend recursion
    // (α = β = 1/4) as a struct-state left fold over one per-user
    // ordered collect — the drift-following forecaster EWMA's flat
    // level cannot be. Fixed fold order + identical IEEE expression
    // trees (the duplicated l_t subexpression included) make the
    // RECURSIVE two-component statistic gate with no tolerance.
    QueryDef("ts_holt",
      (s, d) => TsOps.holt(Tables.events(s, d)
        .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"),
          col("event_id"), col("value"))),
      Some(TsOps.holtSql("events")),
      presentOrder = Seq("user_id")),

    // SAX symbolization: PAA frame means (8 readings/segment,
    // floor-divided milli-units) quantized to a 4-letter word by
    // equal-width bins over each user's own range — the integer-exact
    // stand-in for Gaussian-breakpoint SAX, and the fixed-length
    // symbolic index (iSAX trees, motif/discord scans) a 100 TB series
    // store compares INSTEAD of raw series. One user window + two
    // hash-aggs; the word orders by segment inside the aggregation.
    QueryDef("ts_sax",
      (s, d) => TsOps.sax(Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS LONG)").as("vm")),
        segLen = 8, alpha = 4),
      Some(TsOps.saxSql("events", segLen = 8, alpha = 4)),
      presentOrder = Seq("user_id")),

    // Banded DTW similarity search (Berndt–Clifford / Sakoe–Chiba) over
    // PAA-reduced user series: the alignment-tolerant "find users with
    // this usage pattern" primitive that Euclidean top-k cannot express
    // (a few-reading phase shift costs ~0 under DTW). The whole DP is
    // one codegen'd nested-aggregate fold per pair — integer milli in,
    // BIGINT distance out; oracle replays the identical fold via
    // list_reduce. Query set = every 50th user (broadcast); top-3 per
    // query via WindowGroupLimit.
    QueryDef("ts_dtw_topk",
      (s, d) => TsOps.dtwTopK(Tables.events(s, d)),
      Some(TsOps.dtwTopKSql("events")),
      presentOrder = Seq("query_id", "rank")),

    // LB_Keogh-certified DTW top-k (Keogh & Ratanamahatana KAIS'05) —
    // ts_dtw_topk's scale path, now behind an ADAPTIVE gate (round 9):
    // below 512 candidates/query the envelope build + two DP phases
    // cost more than the DP savings they buy (measured at sf0.1's 149
    // candidates, PLANS.md), so the operator branches ONCE on the PAA
    // vector count — brute scan with n_scored = all candidates below
    // the threshold, the certified two-phase search above it. Both
    // arms are exact, the branch is a deterministic scalar both
    // engines compute, and the oracle replays it as two count-guarded
    // UNION ALL arms.
    QueryDef("ts_dtw_lb",
      (s, d) => TsOps.dtwTopKAdaptive(Tables.events(s, d)),
      Some(TsOps.dtwTopKAdaptiveSql("events")),
      presentOrder = Seq("query_id", "rank")),

    // Matrix-profile motif discovery (Yeh et al. ICDM'16): per user,
    // the closest pair of NON-overlapping length-8 subsequences by
    // exact integer squared distance — the repeated-behavior detector
    // (recurring routine / replayed trace). Subsequences come from one
    // frame-ordered window collect; the exclusion zone pb-pa >= m
    // rules out trivial self-matches; ties (dist, pos_a, pos_b).
    // Hampel rolling-median outlier filter (the robust sensor-cleaning
    // pass run before any model sees the series): per reading, median
    // and MAD of the ±3 window, flag when |x − med|·10⁴ > 44478·MAD
    // (3·1.4826 in ten-thousandths — exact integers, zero float
    // compares). Median, not mean: one spike cannot mask itself by
    // dragging its own threshold. One frame-ordered window per user,
    // bounded 7-long state per row.
    QueryDef("ts_hampel",
      (s, d) => TsOps.hampel(Tables.events(s, d)),
      Some(TsOps.hampelSql("events")),
      presentOrder = Seq("user_id", "pos")),

    QueryDef("ts_matrix_profile",
      (s, d) => TsOps.matrixProfile(Tables.events(s, d)),
      Some(TsOps.matrixProfileSql("events")),
      presentOrder = Seq("user_id")),

    // Horizon-banded matrix profile — the monster-series scale path:
    // motifs must recur within 32 positions, dropping the cell table
    // from O(n²/2) to O(n·H) per series (the banded-join discipline).
    // Same STOMP diagonal recurrence, same tie order; n_pairs counts
    // in-band pairs only. Oracle is the definitional all-pairs form
    // with the horizon predicate.
    QueryDef("ts_matrix_profile_band",
      (s, d) => TsOps.matrixProfileBanded(Tables.events(s, d),
        m = 8, horizon = 32),
      Some(TsOps.matrixProfileBandedSql("events", m = 8, horizon = 32)),
      presentOrder = Seq("user_id")))
}
