package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.GlucoseRange

/** Reference-parity operators (SURVEY.md §2), as composable
  * `DataFrame => DataFrame` combinators. Each works identically on batch
  * and streaming DataFrames unless noted.
  */
object EgvOps {

  /** Reference threshold: StreamsFilterEgvs.java:30 (`value >= 200`). */
  val HighThreshold = 200

  /** F1 — stateless threshold filter (StreamsFilterEgvs.java:28-31).
    * Narrow map-side op; the predicate is pushed to the parquet scan.
    */
  def filterHigh(events: DataFrame, valueCol: String = "value",
                 threshold: Double = HighThreshold): DataFrame =
    events.filter(col(valueCol) >= threshold)

  /** P1 — lenient JSON scalar extraction: NPE-to-default in the reference
    * (StreamsFilterEgvs.java:43-52) becomes an explicit coalesce-to-default.
    */
  def lenientJsonInt(json: Column, path: String, default: Int = 0): Column =
    coalesce(get_json_object(json, path).cast("int"), lit(default))

  /** F2 — static-rule categorization (CategorizeWithSimpleRule.java:66-69):
    * in-range ⇔ lower <= v <= upper, emitted as the reference's string
    * "true"/"false" for sink parity.
    */
  def categorizeSimple(df: DataFrame, valueCol: String = "value",
                       lower: Int = 75, upper: Int = 180): DataFrame =
    df.withColumn("in_range",
      when(col(valueCol).between(lower, upper), "true").otherwise("false"))

  /** U2 — seconds-of-day from a timestamp. The reference parses
    * `systemTime.split("T")[1]` with a lenient 12-hour SimpleDateFormat
    * (EgvTransformer.java:39-49); we use the correct 24-hour semantics.
    */
  def secondsOfDay(ts: Column): Column =
    hour(ts) * 3600 + minute(ts) * 60 + second(ts)

  /** J1 — stream–table interval lookup join + dynamic categorization
    * (CategorizeWithKTableLookup.java:65-75 / EgvTransformer.java:38-84).
    *
    * The ranges side is dimension-sized, so we broadcast: Catalyst plans a
    * BroadcastNestedLoopJoin — the reference's scan-all-ranges algorithm,
    * but vectorized, codegen'd, and with zero shuffle of the (large) event
    * side. Unmatched events are dropped (inner join) — the well-defined
    * version of the reference's null-then-NPE behavior (F4).
    *
    * With non-overlapping ranges (the reference fixture; the realistic
    * config) each event matches at most once and no tie-break is needed.
    * For overlapping ranges the reference takes the FIRST match in key
    * order (EgvTransformer.java:74-79); set `firstMatchOnly=true` to
    * reproduce that. The tie-break is fully deterministic and retry-safe:
    * identical event rows are indistinguishable, so first-match is a
    * function of the DISTINCT event row — events aggregate to distinct
    * rows with a multiplicity count, the min-by-range_id winner is picked
    * per distinct row, and multiplicity re-expands. (A generated
    * monotonically_increasing_id key would renumber rows if a speculative
    * or retried task recomputes the pre-window stage, duplicating or
    * dropping a first match in rare recovery scenarios.) Costs one
    * shuffle on the distinct event row — only pay it when ranges overlap.
    */
  def categorizeWithLookup(events: DataFrame, ranges: DataFrame,
                           tsCol: String = "ts", valueCol: String = "value",
                           firstMatchOnly: Boolean = false): DataFrame = {
    val e0 = events.withColumn("tod", secondsOfDay(col(tsCol)))
    val cond = col("tod") >= col("start_sec") && col("tod") <= col("end_sec")
    val picked =
      if (!firstMatchOnly) e0.join(broadcast(ranges), cond, "inner")
      else {
        val evCols = e0.columns.toSeq
        // range_id leads the struct so min() == first match in key order.
        val rCols = "range_id" +: ranges.columns.filterNot(_ == "range_id").toSeq
        val grouped = e0.groupBy(evCols.map(col): _*)
          .agg(count(lit(1)).as("__mult"))
        grouped.join(broadcast(ranges), cond, "inner")
          .groupBy((evCols :+ "__mult").map(col): _*)
          .agg(min(struct(rCols.map(col): _*)).as("__m"))
          .withColumn("__i", explode(sequence(lit(1L), col("__mult"))))
          .selectExpr(evCols ++ Seq("__m.*"): _*)
      }
    picked.withColumn("in_range",
      when(col(valueCol).between(col("lower_bound"), col("upper_bound")), "true")
        .otherwise("false"))
      .drop("tod")
  }

  /** J1 fast path — zero-shuffle, zero-join first-match lookup for a
    * driver-side ranges list. The sorted ranges unroll into a nested
    * when/otherwise chain, so the whole lookup is one codegen'd scalar
    * expression per row: exactly the reference's first-match-in-key-order
    * `break` (EgvTransformer.java:79) with no join, no shuffle, and no
    * interpreted higher-order functions (an array-literal + `filter(arr,
    * pred)` variant measured 10× slower — HOFs fall out of codegen).
    */
  def lookupFirstMatch(events: DataFrame, ranges: Seq[GlucoseRange],
                       tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val nullMatch = lit(null).cast(
      "struct<range_id:int,lower_bound:int,upper_bound:int>")
    val matched = ranges.sortBy(_.rangeId).foldRight(nullMatch) { (r, acc) =>
      when(col("__tod").between(r.startSec, r.endSec), struct(
        lit(r.rangeId).as("range_id"),
        lit(r.lowerBound).as("lower_bound"),
        lit(r.upperBound).as("upper_bound"))).otherwise(acc)
    }
    events
      .withColumn("__tod", secondsOfDay(col(tsCol)))
      .withColumn("__m", matched)
      .filter(col("__m").isNotNull) // F4: unmatched events are dropped
      .withColumn("range_id", col("__m.range_id"))
      .withColumn("lower_bound", col("__m.lower_bound"))
      .withColumn("upper_bound", col("__m.upper_bound"))
      .withColumn("in_range",
        when(col(valueCol).between(col("lower_bound"), col("upper_bound")), "true")
          .otherwise("false"))
      .drop("__tod", "__m")
  }

  /** S6 — KTable semantics: latest value per key, ordered by (orderCol,
    * tieCol). `max_by(struct(payload), struct(order, tie))` is a single
    * aggregation with map-side partial combine — no window shuffle of the
    * full row set; the exchange carries one row per key per map partition.
    * (Struct-valued buffers are not hash-aggregable, so Spark plans
    * SortAggregate: per-partition sorts, but the shuffle volume — the
    * thing that matters at 100 TB — is still one row per key per mapper.)
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
                  tieCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(col(orderCol), col(tieCol))
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(df.columns.map(c => col(s"__latest.$c")): _*)
  }

  /** Ingest-side explode of the API envelope
    * (DexcomEgvsResponse.egvs: ARRAY<STRUCT>, DexcomEgvsResponse.java:8). */
  def explodeEgvs(responses: DataFrame): DataFrame =
    responses.select(explode(col("egvs")).as("egv")).select("egv.*")
}
