package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.model.Schemas
import graft.ops.{EgvOps, SimOps}

/** Reference-parity queries over the `events` table, which stands in for
  * the EGV stream (FIXTURES.md §B role mapping: ts ↔ systemTime,
  * value ↔ glucose value, user_id ↔ record key, props ↔ raw JSON payload).
  */
object EgvQueries {

  def rangesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Schemas.fixtureRanges
      .map(r => (r.rangeId, r.startSec, r.endSec, r.lowerBound, r.upperBound))
      .toDF("range_id", "start_sec", "end_sec", "lower_bound", "upper_bound")
  }

  private val todSql =
    "(date_part('hour', ts) * 3600 + date_part('minute', ts) * 60 + date_part('second', ts))"

  /** Shared funnel-anchor CTEs (stage minima with the 6-hour conversion
    * window) — used by BOTH `ref_funnel` (final-stage report) and
    * `stream_funnel_transitions` (the twin's per-stage emission grain),
    * so the two oracles cannot drift apart. */
  private val FunnelCtes =
    """u AS (SELECT DISTINCT user_id FROM events),
      | t1 AS (SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      | t2 AS (SELECT e.user_id, min(ts) AS t_click FROM events e
      |  JOIN t1 ON e.user_id = t1.user_id
      |  WHERE event_type = 'click' AND ts > t_view
      |   AND ts <= t_view + INTERVAL 6 HOUR GROUP BY e.user_id),
      | t3 AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
      |  JOIN t2 ON e.user_id = t2.user_id
      |  WHERE event_type = 'purchase' AND ts > t_click
      |   AND ts <= t_click + INTERVAL 6 HOUR GROUP BY e.user_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // F1 — threshold filter (StreamsFilterEgvs.java:28-31), value >= 200.
    QueryDef("ref_filter_high",
      (s, d) => EgvOps.filterHigh(Tables.events(s, d))
        .select("event_id", "user_id", "event_type", "value"),
      Some("""SELECT event_id, user_id, event_type, value FROM events
             | WHERE value >= 200 ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // F2 — static-rule categorization (CategorizeWithSimpleRule.java:66-69).
    QueryDef("ref_categorize_simple",
      (s, d) => EgvOps.categorizeSimple(Tables.events(s, d))
        .select("event_id", "value", "in_range"),
      Some("""SELECT event_id, value,
             | CASE WHEN value BETWEEN 75 AND 180 THEN 'true' ELSE 'false' END AS in_range
             | FROM events ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // J1 — interval lookup join + dynamic categorization
    // (CategorizeWithKTableLookup.java:65-75, EgvTransformer.java:38-84).
    QueryDef("ref_categorize_lookup",
      (s, d) => EgvOps.categorizeWithLookup(Tables.events(s, d), rangesDf(s))
        .select("event_id", "value", "range_id", "lower_bound", "upper_bound", "in_range"),
      Some(s"""WITH ${Schemas.fixtureRangesSql}
              | SELECT event_id, value, range_id, lower_bound, upper_bound,
              | CASE WHEN value BETWEEN lower_bound AND upper_bound THEN 'true' ELSE 'false' END AS in_range
              | FROM events JOIN ranges ON $todSql BETWEEN start_sec AND end_sec
              | ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // J1 fast path — same semantics via the zero-shuffle array-literal
    // first-match lookup (EgvOps.lookupFirstMatch). Same oracle shape.
    QueryDef("ref_categorize_lookup_fast",
      (s, d) => EgvOps.lookupFirstMatch(Tables.events(s, d), Schemas.fixtureRanges)
        .select("event_id", "value", "range_id", "lower_bound", "upper_bound", "in_range"),
      Some(s"""WITH ${Schemas.fixtureRangesSql}
              | SELECT event_id, value, range_id, lower_bound, upper_bound,
              | CASE WHEN value BETWEEN lower_bound AND upper_bound THEN 'true' ELSE 'false' END AS in_range
              | FROM events JOIN ranges ON $todSql BETWEEN start_sec AND end_sec
              | ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // S6 — KTable latest-value-per-key view via single-shuffle max_by.
    QueryDef("ref_latest_by_key",
      (s, d) => EgvOps.latestByKey(Tables.events(s, d),
          Seq("user_id"), "ts", "event_id")
        .select("user_id", "event_id", "ts", "event_type", "value"),
      Some("""SELECT user_id, event_id, ts, event_type, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id")),

    // Sensor-stream gap filling — the downstream consumer of the
    // reference's EGV feed (Dexcom readings drop out; dashboards
    // forward-fill): per user, a 6-hour bucket grid from first to last
    // reading, the last reading in each bucket (max_by on (ts, event_id)
    // — deterministic, partial-aggregable), and forward fill via
    // last(ignoreNulls) over an unbounded-preceding frame. The grid is
    // SPAN-bounded (sequence over bucket range), not corpus-bounded, so
    // output size is users × span regardless of event density.
    QueryDef("ref_gap_fill",
      (s, d) => {
        val bucket = 21600L
        val ev = Tables.events(s, d)
          .withColumn("b", expr(s"CAST(ts AS LONG) div $bucket"))
        val perBucket = ev.groupBy(col("user_id"), col("b"))
          .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("v_last"))
        val grid = perBucket.groupBy(col("user_id"))
          .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
          .select(col("user_id"), explode(expr("sequence(b0, b1)")).as("b"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("b"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        grid.join(perBucket, Seq("user_id", "b"), "left")
          .select(col("user_id"), col("b").as("bucket"),
            last(col("v_last"), ignoreNulls = true).over(w).as("filled"),
            col("v_last").isNull.as("is_gap"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, value,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS b, epoch(ts) AS es
             |  FROM events),
             | pb AS (SELECT user_id, b, v_last FROM (
             |  SELECT user_id, b, value AS v_last, row_number() OVER (
             |    PARTITION BY user_id, b ORDER BY es DESC, event_id DESC) AS rn
             |  FROM ev) WHERE rn = 1),
             | spans AS (SELECT user_id, min(b) AS b0, max(b) AS b1
             |  FROM pb GROUP BY user_id),
             | grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
             |  FROM spans)
             | SELECT grid.user_id, bucket,
             |  last_value(v_last IGNORE NULLS) OVER (PARTITION BY grid.user_id
             |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS filled,
             |  v_last IS NULL AS is_gap
             | FROM grid LEFT JOIN pb ON grid.user_id = pb.user_id AND bucket = pb.b
             | ORDER BY grid.user_id, bucket""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "bucket")),

    // Per-user anomaly scoring on the sensor feed: z = (v − μ_user)/σ_user,
    // the alerting sibling of the reference's fixed-threshold filterHigh.
    // Shape: one groupBy over users (map-side combine) broadcast-joined
    // back — never a per-row window sort over the full feed. The anomaly
    // flag compares the QUANTIZED z (both engines see the identical 4-dp
    // value), so a last-ulp difference in the stddev accumulation cannot
    // flip a boundary row's flag.
    QueryDef("ref_anomaly_zscore",
      (s, d) => {
        val ev = Tables.events(s, d)
        val stats = ev.groupBy(col("user_id"))
          .agg(avg(col("value")).as("__mu"), stddev_samp(col("value")).as("__sd"))
        // NULLIF(sd,0): a constant-valued user has sd=0; Spark's 0/0 is
        // NaN (→ NULL after decimal cast) while DuckDB raises on
        // CAST(round(nan)) — NULL-ing the divisor keeps both engines at
        // a deterministic NULL z.
        ev.join(broadcast(stats), "user_id")
          .withColumn("z",
            round((col("value") - col("__mu")) /
              nullif(col("__sd"), lit(0.0)), 4)
              .cast("decimal(18,4)").cast("double"))
          .select(col("event_id"), col("user_id"), col("value"), col("z"),
            (abs(col("z")) > 2.0).as("is_anomaly"))
      },
      Some("""WITH st AS (SELECT user_id, avg(value) AS mu,
             |  stddev_samp(value) AS sd FROM events GROUP BY user_id)
             | SELECT event_id, events.user_id, value,
             |  CAST(round((value - mu) / NULLIF(sd, 0), 4) AS DECIMAL(18,4))::DOUBLE AS z,
             |  abs(CAST(round((value - mu) / NULLIF(sd, 0), 4) AS DECIMAL(18,4))::DOUBLE) > 2.0
             |    AS is_anomaly
             | FROM events JOIN st ON events.user_id = st.user_id
             | ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // Robust anomaly scoring: the MAD-based modified z-score (Iglewicz &
    // Hoaglin 1993, constant 0.6745, cutoff 3.5) — the outlier detector
    // that survives the outliers themselves, where mean/stddev z-scores
    // are dragged by the very values they should flag. Median and MAD use
    // DISCRETE percentiles (both engines select the lower-middle data
    // VALUE — no interpolation arithmetic exists to diverge), deviations
    // are single IEEE ops on those exact values, and the final score is
    // quant4-quantized, so the gate is engine-exact with zero rounding
    // channels. Shape: two user-keyed agg shuffles (median, then MAD of
    // deviations) + two broadcast joins back — never a per-row window
    // sort of the full feed.
    QueryDef("ref_anomaly_mad",
      (s, d) => {
        val ev = Tables.events(s, d)
        val med = ev.groupBy(col("user_id"))
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
            .as("__med"))
        val dev = ev.join(broadcast(med), "user_id")
        val mad = dev.groupBy(col("user_id"))
          .agg(expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(value - __med))")
            .as("__mad"))
        dev.join(broadcast(mad), "user_id")
          .withColumn("robust_z", SimOps.quant4(
            (col("value") - col("__med")) * lit(0.6745) /
              nullif(col("__mad"), lit(0.0))))
          .select(col("event_id"), col("user_id"), col("value"),
            col("robust_z"), (abs(col("robust_z")) > 3.5).as("is_anomaly"))
      },
      Some(s"""WITH st AS (SELECT user_id, quantile_disc(value, 0.5) AS med
             |  FROM events GROUP BY user_id),
             | dev AS (SELECT e.event_id, e.user_id, e.value, st.med
             |  FROM events e JOIN st ON e.user_id = st.user_id),
             | md AS (SELECT user_id, quantile_disc(abs(value - med), 0.5)
             |  AS mad FROM dev GROUP BY user_id),
             | z AS (SELECT event_id, dev.user_id, value,
             |  ${SimOps.quant4Sql(
                  "(value - med) * 0.6745 / NULLIF(mad, 0)")} AS robust_z
             |  FROM dev JOIN md ON dev.user_id = md.user_id)
             | SELECT event_id, user_id, value, robust_z,
             |  abs(robust_z) > 3.5 AS is_anomaly
             | FROM z ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // Time-in-range report — THE clinical metric the reference's glucose
    // feed exists to produce (Dexcom Clarity's headline number): per
    // user, duration-weighted seconds and micro-unit percentages in the
    // standard five glycemic bands (<54 / 54-69 / 70-180 / 181-250 /
    // >250 mg/dL). Each reading carries until the next one (lead over
    // (ts, event_id) — deterministic under ts ties), gaps longer than
    // 30 min contribute only 30 min (sensor-off policy), and the FINAL
    // reading carries the full 30-min timeout (lead is NULL and both
    // engines' least() skips NULLs — the last-known-value-persists
    // contract, made explicit here). All arithmetic is integer
    // seconds and floor-division micro-units — hash-exact, zero floats.
    // Shape: ONE user-keyed window sort (time-series semantics need
    // per-user order) then a user roll-up on the same partitioning —
    // Spark reuses the exchange, so it's one shuffle end-to-end.
    QueryDef("ref_time_in_range",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("sec", expr("CAST(ts AS LONG)"))
          .withColumn("dur",
            least(lead(col("sec"), 1).over(w) - col("sec"), lit(1800L)))
        def band(pred: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          sum(when(pred, col("dur")).otherwise(lit(0L)))
        val agg = ev.groupBy(col("user_id")).agg(
          sum(col("dur")).as("total_sec"),
          band(col("value") < 54).as("very_low_sec"),
          band(col("value") >= 54 && col("value") < 70).as("low_sec"),
          band(col("value") >= 70 && col("value") <= 180).as("in_range_sec"),
          band(col("value") > 180 && col("value") <= 250).as("high_sec"),
          band(col("value") > 250).as("very_high_sec"))
        agg.withColumn("tir_micro",
          expr("(in_range_sec * 1000000) div total_sec"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, value,
             |  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |  ts FROM events),
             | f AS (SELECT user_id, value,
             |  least(lead(sec) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) - sec, 1800) AS dur FROM ev)
             | SELECT user_id, CAST(sum(dur) AS BIGINT) AS total_sec,
             |  CAST(sum(CASE WHEN value < 54 THEN dur ELSE 0 END) AS BIGINT) AS very_low_sec,
             |  CAST(sum(CASE WHEN value >= 54 AND value < 70 THEN dur ELSE 0 END) AS BIGINT) AS low_sec,
             |  CAST(sum(CASE WHEN value >= 70 AND value <= 180 THEN dur ELSE 0 END) AS BIGINT) AS in_range_sec,
             |  CAST(sum(CASE WHEN value > 180 AND value <= 250 THEN dur ELSE 0 END) AS BIGINT) AS high_sec,
             |  CAST(sum(CASE WHEN value > 250 THEN dur ELSE 0 END) AS BIGINT) AS very_high_sec,
             |  (CAST(sum(CASE WHEN value >= 70 AND value <= 180 THEN dur ELSE 0 END) AS BIGINT)
             |    * 1000000) // CAST(sum(dur) AS BIGINT) AS tir_micro
             | FROM f GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id")),

    // Glycemic variability panel — the remaining numbers on a CGM
    // report: per-user mean, SD, coefficient of variation (CV = SD/mean;
    // < 36% is the consensus stability target), GMI (the lab-free A1C
    // surrogate, 3.31 + 0.02392·mean) and ADAG eA1C ((mean+46.7)/28.7).
    // One user-keyed agg (map-side combine), formulas applied to the
    // aggregates and quant4-quantized — identical expression trees on
    // both engines, so last-ulp accumulation wobble cannot flip a digit.
    QueryDef("ref_glycemic_stats",
      (s, d) => {
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_readings"),
            avg(col("value")).as("__mu"),
            stddev_samp(col("value")).as("__sd"))
          .select(col("user_id"), col("n_readings"),
            SimOps.quant4(col("__mu")).as("mean_glucose"),
            SimOps.quant4(col("__sd")).as("sd_glucose"),
            SimOps.quant4(col("__sd") / nullif(col("__mu"), lit(0.0)) * lit(100.0))
              .as("cv_pct"),
            SimOps.quant4(lit(3.31) + lit(0.02392) * col("__mu")).as("gmi_pct"),
            SimOps.quant4((col("__mu") + lit(46.7)) / lit(28.7)).as("ea1c_pct"))
      },
      Some(s"""WITH st AS (SELECT user_id,
             |  CAST(count(*) AS BIGINT) AS n_readings,
             |  avg(value) AS mu, stddev_samp(value) AS sd
             |  FROM events GROUP BY user_id)
             | SELECT user_id, n_readings,
             |  ${SimOps.quant4Sql("mu")} AS mean_glucose,
             |  ${SimOps.quant4Sql("sd")} AS sd_glucose,
             |  ${SimOps.quant4Sql("sd / NULLIF(mu, 0) * 100.0")} AS cv_pct,
             |  ${SimOps.quant4Sql("3.31 + 0.02392 * mu")} AS gmi_pct,
             |  ${SimOps.quant4Sql("(mu + 46.7) / 28.7")} AS ea1c_pct
             | FROM st ORDER BY user_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id")),

    // Daily glucose summary + day-over-day trend — the per-day row of a
    // CGM report (reading-count grain; duration-weighted bands live in
    // ref_time_in_range). Shape: the (user, day) hash-agg runs FIRST with
    // map-side combine (the full feed shrinks to day-grain rows before
    // anything else moves), then the trend window re-shuffles only those
    // slim aggregated rows by user. In-range share is exact integer
    // micro-units; the day-over-day delta subtracts two already-4dp-
    // quantized doubles (exact in IEEE on both engines).
    QueryDef("ref_daily_summary",
      (s, d) => {
        val day = 86400L
        val byDay = Tables.events(s, d)
          .select(col("user_id"), expr(s"CAST(ts AS LONG) div $day").as("day"),
            col("value"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_readings"),
            avg(col("value")).as("__mu"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"),
            sum(when(col("value").between(70, 180), 1L).otherwise(0L))
              .as("__nir"))
          .select(col("user_id"), col("day"), col("n_readings"),
            SimOps.quant4(col("__mu")).as("mean_glucose"),
            col("min_value"), col("max_value"),
            expr("__nir * 1000000L div n_readings").as("in_range_micro"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("day"))
        byDay.withColumn("delta_mean",
          SimOps.quant4(col("mean_glucose") - lag(col("mean_glucose"), 1).over(w)))
      },
      Some(s"""WITH byday AS (SELECT user_id,
             |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             |   CAST(count(*) AS BIGINT) AS n_readings, avg(value) AS mu,
             |   min(value) AS min_value, max(value) AS max_value,
             |   CAST(sum(CASE WHEN value BETWEEN 70 AND 180 THEN 1 ELSE 0 END)
             |     AS BIGINT) AS nir
             |  FROM events GROUP BY 1, 2),
             | q AS (SELECT user_id, day, n_readings,
             |   ${SimOps.quant4Sql("mu")} AS mean_glucose, min_value, max_value,
             |   nir * 1000000 // n_readings AS in_range_micro FROM byday)
             | SELECT user_id, day, n_readings, mean_glucose, min_value,
             |   max_value, in_range_micro,
             |   ${SimOps.quant4Sql(
                    "mean_glucose - lag(mean_glucose, 1) OVER " +
                    "(PARTITION BY user_id ORDER BY day)")} AS delta_mean
             | FROM q ORDER BY user_id, day""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "day")),

    // Hypoglycemic-episode detection — the gaps-and-islands pattern
    // (contiguous runs of a CONDITION, not time gaps like q_sessionize):
    // runs of readings below 70 mg/dL lasting >= 15 min, with onset,
    // duration, reading count, and nadir per episode (the alert
    // consumers page on). Island id = running count of non-low readings
    // (constant inside each low run, both engines); per-episode roll-up
    // on the same user partitioning as the window — one exchange.
    // Trend arrows — the Dexcom receiver's 7-arrow rate-of-change
    // classification (G6 user guide thresholds in mg/dL/min: >3 double
    // up, 2..3 up, 1..2 forty-five up, -1..1 flat, mirrored down):
    // per reading, rate = Δvalue / Δminutes vs the previous reading of
    // the same user. Zero-Δt pairs (same-second readings) classify as
    // 'dup' and the first reading as 'first' BEFORE any division, so
    // no Inf/NaN ever reaches the output — the rate is NULL there, a
    // rendering-stable value on both engines. One user-keyed exchange;
    // the division is IEEE-exact so the quantized rate and every
    // threshold compare gate with no tolerance.
    QueryDef("ref_trend_arrows",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"),
            col("event_id"), col("value"))
          .withColumn("__dv", col("value") - lag(col("value"), 1).over(w))
          .withColumn("__dt", col("sec") - lag(col("sec"), 1).over(w))
          .withColumn("rate",
            when(col("__dt") > 0,
              SimOps.quant4(col("__dv") / (col("__dt").cast("double") / 60.0))))
          .withColumn("arrow",
            when(col("__dt").isNull, "first")
              .when(col("__dt") === 0, "dup")
              .when(col("rate") > 3, "double_up")
              .when(col("rate") > 2, "single_up")
              .when(col("rate") > 1, "forty_five_up")
              .when(col("rate") >= -1, "flat")
              .when(col("rate") >= -2, "forty_five_down")
              .when(col("rate") >= -3, "single_down")
              .otherwise("double_down"))
          .select(col("user_id"), col("event_id"), col("rate"), col("arrow"))
      },
      Some(s"""WITH l AS (SELECT user_id, event_id, value,
             |   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |   value - lag(value, 1) OVER w AS dv,
             |   CAST(floor(epoch(ts)) AS BIGINT)
             |     - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS dt
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)),
             | r AS (SELECT user_id, event_id, dt,
             |   CASE WHEN dt > 0
             |     THEN ${SimOps.quant4Sql("dv / (dt::DOUBLE / 60.0)")}
             |   END AS rate FROM l)
             | SELECT user_id, event_id, rate,
             |  CASE WHEN dt IS NULL THEN 'first'
             |   WHEN dt = 0 THEN 'dup'
             |   WHEN rate > 3 THEN 'double_up'
             |   WHEN rate > 2 THEN 'single_up'
             |   WHEN rate > 1 THEN 'forty_five_up'
             |   WHEN rate >= -1 THEN 'flat'
             |   WHEN rate >= -2 THEN 'forty_five_down'
             |   WHEN rate >= -3 THEN 'single_down'
             |   ELSE 'double_down' END AS arrow
             | FROM r ORDER BY user_id, event_id""".stripMargin
        .replace("\n", "")),
      presentOrder = Seq("user_id", "event_id")),

    // EWMA trend — the exponentially weighted smoother CGM UIs draw
    // (trend arrows weight recent readings; alpha=0.25 here): the
    // recursion s_t = 0.75*s_{t-1} + 0.25*x_t is a LEFT FOLD over the
    // user's readings in (ts, event_id) order — not expressible as any
    // window frame aggregate — run as a codegen'd array `aggregate` HOF
    // over one per-user ordered collect (DuckDB twin: list_reduce,
    // whose first-element seeding matches the null-seeded CASE). The
    // fold fixes the operation ORDER, so two multiplies and an add per
    // step are IEEE-identical in both engines — the result gates with
    // no tolerance. One user-keyed exchange; state linear in the
    // user's readings (bounded by retention, ~8k/month per CGM user).
    QueryDef("ref_ewma_trend",
      (s, d) => {
        Tables.events(s, d)
          .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"),
            col("event_id"), col("value"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_readings"),
            expr("""aggregate(
                transform(
                  array_sort(collect_list(struct(sec, event_id, value))),
                  s -> s.value),
                CAST(NULL AS DOUBLE),
                (acc, x) -> CASE WHEN acc IS NULL THEN x
                            ELSE acc * CAST(0.75 AS DOUBLE)
                                 + x * CAST(0.25 AS DOUBLE) END)""")
              .as("__ewma"))
          .select(col("user_id"), col("n_readings"),
            SimOps.quant4(col("__ewma")).as("ewma"))
      },
      Some(s"""WITH o AS (SELECT user_id,
             |   list(value ORDER BY epoch(ts), event_id) AS xs,
             |   CAST(count(*) AS BIGINT) AS n_readings
             |  FROM events GROUP BY user_id)
             | SELECT user_id, n_readings,
             |  ${SimOps.quant4Sql(
                  """list_reduce(xs, (acc, x) -> acc * CAST(0.75 AS DOUBLE)
                     + x * CAST(0.25 AS DOUBLE))""")} AS ewma
             | FROM o ORDER BY user_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id")),

    // Sensor-compliance report — the wear-time/data-completeness panel a
    // CGM clinic reviews before trusting any other metric (a Dexcom G6
    // uploads 288 five-minute readings/day; AGP guidelines want >=70%
    // capture): per (user, day) the reading count, first/last
    // seconds-of-day, the LONGEST intra-day silence (max lag gap), and
    // capture permille vs the 288 cadence. The lag window and the
    // (user, day) roll-up share one exchange; all outputs integer.
    QueryDef("ref_sensor_compliance",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("day"))
          .orderBy(col("sec"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("sec", expr("CAST(ts AS LONG)"))
          .withColumn("day", expr("sec div 86400"))
          .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_readings"),
            (min(col("sec")) % 86400).as("first_sod"),
            (max(col("sec")) % 86400).as("last_sod"),
            coalesce(max(col("gap")), lit(0L)).as("max_gap_sec"))
          .withColumn("capture_permille",
            expr("n_readings * 1000 div 288"))
      },
      Some("""WITH g AS (SELECT user_id, event_id,
             |  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
             |  FROM events),
             | l AS (SELECT user_id, day, sec,
             |  sec - lag(sec, 1) OVER (PARTITION BY user_id, day
             |    ORDER BY sec, event_id) AS gap FROM g)
             | SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_readings,
             |  min(sec) % 86400 AS first_sod, max(sec) % 86400 AS last_sod,
             |  coalesce(max(gap), 0) AS max_gap_sec,
             |  CAST(count(*) AS BIGINT) * 1000 // 288 AS capture_permille
             | FROM l GROUP BY user_id, day
             | ORDER BY user_id, day""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "day")),

    QueryDef("ref_hypo_episodes",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("sec", expr("CAST(ts AS LONG)"))
          .withColumn("low", (col("value") < 70).cast("int"))
          .withColumn("grp", sum(lit(1) - col("low")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
          .filter(col("low") === 1)
          .groupBy(col("user_id"), col("grp"))
          .agg(min(col("sec")).as("ep_start_sec"),
            (max(col("sec")) - min(col("sec"))).as("dur_sec"),
            count(lit(1)).as("n_readings"),
            min(col("value")).as("nadir"))
          .filter(col("dur_sec") >= 900)
          .select(col("user_id"), col("ep_start_sec"), col("dur_sec"),
            col("n_readings"), col("nadir"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, value,
             |  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |  CASE WHEN value < 70 THEN 1 ELSE 0 END AS low,
             |  CAST(sum(CASE WHEN value < 70 THEN 0 ELSE 1 END) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
             |  FROM events),
             | ep AS (SELECT user_id, min(sec) AS ep_start_sec,
             |  max(sec) - min(sec) AS dur_sec,
             |  CAST(count(*) AS BIGINT) AS n_readings, min(value) AS nadir
             |  FROM g WHERE low = 1 GROUP BY user_id, grp)
             | SELECT user_id, ep_start_sec, dur_sec, n_readings, nadir
             | FROM ep WHERE dur_sec >= 900
             | ORDER BY user_id, ep_start_sec""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "ep_start_sec")),

    // Event-type transition matrix (first-order Markov over the event
    // stream): count + micro-unit probability of each (from -> to) pair
    // per user-ordered sequence — the behavioral-model prep beside the
    // funnel. Integer floor-division probabilities; one user-keyed
    // window + one tiny (from,to) roll-up.
    QueryDef("ref_event_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = tr.groupBy(col("from_type"))
          .agg(sum(col("n")).as("n_from"))
        tr.join(broadcast(tot), "from_type")
          .withColumn("p_micro", expr("(n * 1000000) div n_from"))
          .select(col("from_type"), col("to_type"), col("n"),
            col("n_from"), col("p_micro"))
      },
      Some("""WITH tr AS (SELECT user_id, event_type AS from_type,
             |  lead(event_type) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS to_type FROM events),
             | c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
             | t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             |  FROM c GROUP BY 1)
             | SELECT c.from_type, to_type, n, n_from,
             |  (n * 1000000) // n_from AS p_micro
             | FROM c JOIN t ON c.from_type = t.from_type
             | ORDER BY 1, 2""".stripMargin.replace("\n", "")),
      presentOrder = Seq("from_type", "to_type")),

    // Ambulatory glucose profile (AGP): the hour-of-day percentile bands
    // (p05/p25/p50/p75/p95) every CGM report draws — DISCRETE percentiles
    // so both engines select actual data values (zero interpolation
    // arithmetic); one hour-keyed agg shuffle, sort cost bounded by
    // per-hour group size, never a global sort.
    QueryDef("ref_agp_profile",
      (s, d) => {
        def pd(p: Double, name: String) =
          expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY value)").as(name)
        Tables.events(s, d)
          .withColumn("hour_of_day", hour(col("ts")))
          .groupBy("hour_of_day")
          .agg(count(lit(1)).as("n_readings"),
            pd(0.05, "p05"), pd(0.25, "p25"), pd(0.5, "p50"),
            pd(0.75, "p75"), pd(0.95, "p95"))
      },
      Some("""SELECT CAST(date_part('hour', ts) AS INT) AS hour_of_day,
             | CAST(count(*) AS BIGINT) AS n_readings,
             | quantile_disc(value, 0.05) AS p05,
             | quantile_disc(value, 0.25) AS p25,
             | quantile_disc(value, 0.5) AS p50,
             | quantile_disc(value, 0.75) AS p75,
             | quantile_disc(value, 0.95) AS p95
             | FROM events GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", "")),
      presentOrder = Seq("hour_of_day")),

    // Cohort retention matrix: users grouped by first-activity DAY,
    // tracked for activity on each subsequent day — the product-
    // analytics staple beside the funnel (day grain: the corpus is dense
    // enough that weekly cohorts retain 100% everywhere; daily cohorts
    // genuinely decay). Pure integer arithmetic
    // (epoch-week floor division, micro-unit retention ratio), so the
    // gate is hash-exact. Shape: one user-keyed min-agg (cohort
    // assignment), one equi-join back, one distinct at (user, week)
    // grain, one matrix roll-up — all map-side-combinable hash aggs;
    // never a per-user window sort.
    QueryDef("ref_retention_cohorts",
      (s, d) => {
        val week = 86400L
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr(s"CAST(ts AS LONG) div $week").as("w"))
        val first = ev.groupBy("user_id").agg(min(col("w")).as("w0"))
        val act = ev.join(first, "user_id")
          .select(col("user_id"), col("w0").as("cohort_day"),
            (col("w") - col("w0")).as("day_n"))
          .distinct()
        val cs = first.select(col("w0").as("cohort_day"))
          .groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
        act.groupBy(col("cohort_day"), col("day_n"))
          .agg(count(lit(1)).as("n_active"))
          .join(cs, "cohort_day")
          .withColumn("retention_micro",
            expr("(n_active * 1000000) div cohort_users"))
          .select(col("cohort_day"), col("day_n"), col("n_active"),
            col("cohort_users"), col("retention_micro"))
      },
      Some("""WITH ev AS (SELECT user_id,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS w FROM events),
             | f AS (SELECT user_id, min(w) AS w0 FROM ev GROUP BY user_id),
             | act AS (SELECT DISTINCT ev.user_id, w0 AS cohort_day,
             |  w - w0 AS day_n FROM ev JOIN f ON ev.user_id = f.user_id),
             | cs AS (SELECT w0 AS cohort_day, CAST(count(*) AS BIGINT)
             |  AS cohort_users FROM f GROUP BY w0)
             | SELECT a.cohort_day, day_n, CAST(count(*) AS BIGINT) AS n_active,
             |  cohort_users,
             |  (CAST(count(*) AS BIGINT) * 1000000) // cohort_users AS retention_micro
             | FROM act a JOIN cs ON a.cohort_day = cs.cohort_day
             | GROUP BY a.cohort_day, day_n, cohort_users
             | ORDER BY 1, 2""".stripMargin.replace("\n", "")),
      presentOrder = Seq("cohort_day", "day_n")),

    // Event-sequence funnel (view → click → purchase): the ordered
    // conversion analysis MATCH_RECOGNIZE engines sell, composed from
    // three stage-anchored min-aggregations — each stage's earliest
    // occurrence strictly after the previous anchor AND within a 6-hour
    // conversion window (without the window the dense corpus converts
    // everyone — 150 → 19 → 1 with it). Three
    // user-keyed agg shuffles + broadcast-size joins per stage; no
    // per-user event sorting, no cross join, scales with distinct users.
    QueryDef("ref_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val users = ev.select(col("user_id")).distinct()
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val t2 = ev.filter(col("event_type") === "click")
          .join(t1, "user_id")
          .filter(col("ts") > col("t_view") &&
            col("ts") <= col("t_view") + expr("INTERVAL 6 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val t3 = ev.filter(col("event_type") === "purchase")
          .join(t2, "user_id")
          .filter(col("ts") > col("t_click") &&
            col("ts") <= col("t_click") + expr("INTERVAL 6 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        users.join(t1, Seq("user_id"), "left")
          .join(t2, Seq("user_id"), "left")
          .join(t3, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
            when(col("t_purchase").isNotNull, 3)
              .when(col("t_click").isNotNull, 2)
              .when(col("t_view").isNotNull, 1)
              .otherwise(0).as("stage"))
      },
      Some(s"""WITH $FunnelCtes
             | SELECT u.user_id, t_view, t_click, t_purchase,
             |  CASE WHEN t_purchase IS NOT NULL THEN 3
             |       WHEN t_click IS NOT NULL THEN 2
             |       WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage
             | FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
             |  LEFT JOIN t2 ON u.user_id = t2.user_id
             |  LEFT JOIN t3 ON u.user_id = t3.user_id
             | ORDER BY u.user_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id")),

    // Batch twin of StatefulOps.streamingFunnel's EMISSION grain: one
    // (user, stage, ts) row per stage reached — exactly the
    // FunnelTransition rows the live twin appends (stage anchors, not
    // just the final stage ref_funnel reports). Derived by unpivoting
    // the SAME gated funnel frame, so the twin, this gate, and
    // ref_funnel cannot drift apart independently: the StreamingSpec
    // parity test compares the twin's rows against this query.
    QueryDef("stream_funnel_transitions",
      (s, d) => graft.Catalog.queries("ref_funnel")(s, d)
        .select(col("user_id"), expr(
          "stack(3, 1, t_view, 2, t_click, 3, t_purchase) AS (stage, ts)"))
        .filter(col("ts").isNotNull),
      Some(s"""WITH $FunnelCtes
             | SELECT user_id, 1 AS stage, t_view AS ts FROM t1
             | UNION ALL SELECT user_id, 2 AS stage, t_click AS ts FROM t2
             | UNION ALL SELECT user_id, 3 AS stage, t_purchase AS ts FROM t3
             | ORDER BY user_id, stage""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "stage")),

    // P1 — lenient JSON scalar extraction with NPE-to-0 semantics
    // (StreamsFilterEgvs.java:43-52) made explicit via coalesce.
    QueryDef("ref_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          EgvOps.lenientJsonInt(col("props"), "$.k").as("k")),
      Some("""SELECT event_id,
             | COALESCE(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER), 0) AS k
             | FROM events ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id"))
  )
}
