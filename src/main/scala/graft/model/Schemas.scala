package graft.model

import org.apache.spark.sql.types._

/** Engine-level schemas for the CGM (estimated-glucose-value) domain.
  *
  * The reference pipeline operates on schemaless JSON (`JsonNode`) records;
  * our engine fixes the schema at the edge — the honest engine-level
  * contract — and parses with `from_json`.
  * Field inventory: /root/reference/src/main/java/com/github/robertzych/kafka/Egv.java:3-12.
  */
final case class Egv(
    systemTime: String,
    displayTime: String,
    value: Int,
    realtimeValue: Int,
    smoothedValue: Int,
    status: String,
    trend: String,
    trendRate: Float)

/** API envelope: DexcomEgvsResponse.java:5-9 — exploded at ingest. */
final case class EgvsResponse(unit: String, rateUnit: String, egvs: Seq[Egv])

/** A time-of-day target range, the KTable row of the lookup join.
  * Shape: CategorizeWithKTableLookupTest.java:54-73 (start/end "HH:mm:ss",
  * int bounds, keyed by int id). We store times as seconds-of-day ints so
  * the interval predicate is a pure integer comparison.
  */
final case class GlucoseRange(
    rangeId: Int,
    startSec: Int,
    endSec: Int,
    lowerBound: Int,
    upperBound: Int)

object Schemas {
  val egv: StructType = StructType(Seq(
    StructField("systemTime", StringType),
    StructField("displayTime", StringType),
    StructField("value", IntegerType),
    StructField("realtimeValue", IntegerType),
    StructField("smoothedValue", IntegerType),
    StructField("status", StringType),
    StructField("trend", StringType),
    StructField("trendRate", FloatType)))

  val egvsResponse: StructType = StructType(Seq(
    StructField("unit", StringType),
    StructField("rateUnit", StringType),
    StructField("egvs", ArrayType(egv))))

  /** Reference unit-test ranges fixture (FIXTURES.md A.3): three closed,
    * non-overlapping intervals covering the whole day. */
  val fixtureRanges: Seq[GlucoseRange] = Seq(
    GlucoseRange(1, 0, 6 * 3600 - 1, 80, 150),       // 00:00:00–05:59:59
    GlucoseRange(2, 6 * 3600, 22 * 3600 - 1, 70, 180), // 06:00:00–21:59:59
    GlucoseRange(3, 22 * 3600, 24 * 3600 - 1, 80, 150)) // 22:00:00–23:59:59

  /** The same fixture as inline SQL VALUES for DuckDB oracle twins. */
  val fixtureRangesSql: String =
    "ranges(range_id, start_sec, end_sec, lower_bound, upper_bound) AS (VALUES " +
      fixtureRanges.map(r => s"(${r.rangeId}, ${r.startSec}, ${r.endSec}, ${r.lowerBound}, ${r.upperBound})")
        .mkString(", ") + ")"
}
