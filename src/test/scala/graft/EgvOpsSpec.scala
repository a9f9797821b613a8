package graft

import org.apache.spark.sql.functions._

import graft.model.{GlucoseRange, Schemas}
import graft.ops.EgvOps

/** Reference-parity fixtures (FIXTURES.md §A, ported from the reference's
  * TopologyTestDriver tests — CategorizeWithSimpleRuleTest.java,
  * CategorizeWithKTableLookupTest.java, StreamsFilterEgvs.java). */
class EgvOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def egvs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("value", "systemTime")
      .withColumn("ts", to_timestamp(col("systemTime")))
  }

  // A.2: 65 → false, 100 → true, 265 → false (75 <= v <= 180)
  test("categorizeSimple reproduces the reference assert set") {
    val out = EgvOps.categorizeSimple(
      egvs(65 -> "2020-11-02T02:00:00", 100 -> "2020-11-02T02:05:00",
        265 -> "2020-11-02T02:10:00"))
      .select("value", "in_range").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSet === Set(65 -> "false", 100 -> "true", 265 -> "false"))
  }

  // Boundary algebra: closed interval on both ends.
  test("categorizeSimple boundaries are closed") {
    val out = EgvOps.categorizeSimple(
      egvs(74 -> "2020-11-02T00:00:00", 75 -> "2020-11-02T00:00:00",
        180 -> "2020-11-02T00:00:00", 181 -> "2020-11-02T00:00:00"))
      .select("value", "in_range").collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(out === Map(74 -> "false", 75 -> "true", 180 -> "true", 181 -> "false"))
  }

  // A.4: interval lookup join + dynamic categorization.
  test("categorizeWithLookup reproduces the reference KTable-lookup asserts") {
    import spark.implicits._
    val ranges = Schemas.fixtureRanges
      .map(r => (r.rangeId, r.startSec, r.endSec, r.lowerBound, r.upperBound))
      .toDF("range_id", "start_sec", "end_sec", "lower_bound", "upper_bound")
    val out = EgvOps.categorizeWithLookup(
      egvs(75 -> "2020-11-02T02:00:00", 100 -> "2020-11-02T12:00:00",
        265 -> "2020-11-02T19:00:00"), ranges)
      .select("value", "range_id", "in_range").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(out.toSet === Set((75, 1, "false"), (100, 2, "true"), (265, 2, "false")))
  }

  test("firstMatchOnly emits one match per event even for identical event rows") {
    import spark.implicits._
    // Overlapping ranges + two byte-identical events: each event must emit
    // its own first match (range 1), not collapse into one row.
    val ranges = Seq((1, 0, 86399, 70, 180), (2, 0, 86399, 80, 200))
      .toDF("range_id", "start_sec", "end_sec", "lower_bound", "upper_bound")
    val out = EgvOps.categorizeWithLookup(
      egvs(100 -> "2020-11-02T02:00:00", 100 -> "2020-11-02T02:00:00"),
      ranges, firstMatchOnly = true)
      .select("value", "range_id").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq === Seq(100 -> 1, 100 -> 1))
  }

  test("lookupFirstMatch matches categorizeWithLookup on non-overlapping ranges") {
    import spark.implicits._
    val df = egvs(75 -> "2020-11-02T02:00:00", 100 -> "2020-11-02T12:00:00",
      265 -> "2020-11-02T19:00:00", 130 -> "2020-11-02T23:30:00")
    val ranges = Schemas.fixtureRanges
      .map(r => (r.rangeId, r.startSec, r.endSec, r.lowerBound, r.upperBound))
      .toDF("range_id", "start_sec", "end_sec", "lower_bound", "upper_bound")
    val a = EgvOps.categorizeWithLookup(df, ranges)
      .select("value", "range_id", "in_range").collect().toSet
    val b = EgvOps.lookupFirstMatch(df, Schemas.fixtureRanges)
      .select("value", "range_id", "in_range").collect().toSet
    assert(a === b)
  }

  // First-match-in-key-order on OVERLAPPING ranges (EgvTransformer.java:74-79).
  test("lookupFirstMatch takes the first range in key order when ranges overlap") {
    val overlapping = Seq(
      GlucoseRange(1, 0, 12 * 3600, 80, 150),
      GlucoseRange(2, 0, 24 * 3600 - 1, 70, 180))
    val out = EgvOps.lookupFirstMatch(egvs(100 -> "2020-11-02T02:00:00"), overlapping)
      .select("range_id").collect().map(_.getInt(0))
    assert(out.toSeq === Seq(1))
  }

  // A.5: threshold filter; lenient extraction defaults missing to 0.
  test("filterHigh keeps only values >= 200; lenient JSON extract defaults to 0") {
    import spark.implicits._
    val out = EgvOps.filterHigh(egvs(65 -> "2020-11-02T02:00:00",
      100 -> "2020-11-02T02:05:00", 265 -> "2020-11-02T02:10:00"))
      .select("value").collect().map(_.getInt(0))
    assert(out.toSeq === Seq(265))

    val json = Seq("""{"value": 250}""", """{"nope": 1}""", "not json")
      .toDF("payload")
      .select(EgvOps.lenientJsonInt(col("payload"), "$.value").as("v"))
      .collect().map(_.getInt(0))
    assert(json.toSeq === Seq(250, 0, 0))
  }

  test("latestByKey keeps exactly the last row per key with tie-break") {
    import spark.implicits._
    val df = Seq(
      ("u1", 1L, 10), ("u1", 3L, 30), ("u1", 2L, 20),
      ("u2", 5L, 50), ("u2", 5L, 51) // tie on order col -> max tie col wins
    ).toDF("user_id", "offset", "value").withColumn("rid", col("value"))
    val out = EgvOps.latestByKey(df, Seq("user_id"), "offset", "rid")
      .select("user_id", "value").collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out === Map("u1" -> 30, "u2" -> 51))
  }

  test("explodeEgvs flattens the API envelope") {
    import spark.implicits._
    val env = Seq(
      ("mg/dL", Seq((100, "2020-11-02T02:00:00"), (200, "2020-11-02T02:05:00")))
    ).toDF("unit", "pairs")
      .select(col("unit"), expr(
        "transform(pairs, p -> named_struct('value', p._1, 'systemTime', p._2))").as("egvs"))
    val out = EgvOps.explodeEgvs(env).select("value").collect().map(_.getInt(0))
    assert(out.toSeq === Seq(100, 200))
  }
}
