package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.model.Schemas
import graft.ops.EgvOps

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
