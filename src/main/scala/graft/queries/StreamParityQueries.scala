package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Batch twins of the streaming operators (SURVEY.md §2.11 "streaming
  * windows"): tumbling/sliding windows and session windows over `events`.
  *
  * Value aggregates are emitted as round(sum, 2), NOT averages:
  * events.value has ≤2 decimals so the 2-dp-rounded sum is bit-identical
  * across engines regardless of accumulation order, while any divided
  * average can land exactly on a rounding boundary where Spark's
  * BigDecimal HALF_UP and DuckDB's float rounding disagree (observed on
  * 3/1400 sliding-window rows). Average capability is exercised by the
  * relational queries; here the stable sum is the contract.
  * `window`/`session_window` are the same Catalyst operators Structured
  * Streaming uses incrementally — running them on a batch DataFrame gives
  * the oracle-checkable semantics; graft.streaming wires the identical
  * expressions onto readStream sources.
  */
object StreamParityQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour windows per event_type: epoch-aligned, same as
    // DuckDB's date_trunc. One shuffle on (window, event_type).
    QueryDef("stream_tumbling_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          max(col("value")).as("max_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"), col("max_value")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             | count(*) AS n_events, round(sum(value), 2) AS sum_value,
             | max(value) AS max_value
             | FROM events GROUP BY 1, 2
             | ORDER BY window_start, event_type""".stripMargin.replace("\n", "")),
      presentOrder = Seq("window_start", "event_type")),

    // Sliding 2-hour windows advancing hourly: every event lands in two
    // windows; the oracle unnests the two containing window starts.
    QueryDef("stream_sliding_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("window_start"), col("n_events"), col("sum_value")),
      Some("""WITH x AS (SELECT value,
             |  unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS window_start
             |  FROM events)
             | SELECT window_start, count(*) AS n_events,
             |  round(sum(value), 2) AS sum_value
             | FROM x GROUP BY window_start ORDER BY window_start""".stripMargin.replace("\n", "")),
      presentOrder = Seq("window_start")),

    // Session windows (60-minute inactivity gap) per user. The DuckDB twin
    // is the classic gaps-and-islands rewrite; Spark's session end is
    // last_event + gap, reproduced on the oracle side.
    QueryDef("stream_session_windows",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "60 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_value")),
      Some("""WITH g AS (
             |  SELECT user_id, ts, value,
             |   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |        >= INTERVAL 60 MINUTE THEN 1 ELSE 0 END AS new_session
             |  FROM events),
             | i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g)
             | SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 60 MINUTE AS session_end,
             |  count(*) AS n_events, round(sum(value), 2) AS sum_value
             | FROM i GROUP BY user_id, session_id
             | ORDER BY user_id, session_start""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "session_start"))
  )
}
