package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** U1 — the reference's "UDF with keyed state" capability
  * (EgvTransformer.java:20-90, a ValueTransformer holding a state store),
  * generalized the Spark way: `flatMapGroupsWithState` over a typed
  * KeyValueGroupedDataset.
  *
  * The concrete operator: per-user glucose delta tracking — for each
  * reading emit the previous reading's value and the delta, the stateful
  * sibling of `Egv.trendRate` (Egv.java:11). State is one row per key
  * (bounded), watermark-safe, and identical in batch tests via the
  * MemoryStream harness.
  */
object StatefulOps {

  case class Reading(userId: String, ts: java.sql.Timestamp, value: Int)
  case class ReadingDelta(userId: String, ts: java.sql.Timestamp, value: Int,
                          prevValue: Option[Int], delta: Option[Int])
  case class LastSeen(ts: Long, value: Int)

  /** Emits one ReadingDelta per input reading, ordered by event time
    * within each (group, micro-batch). */
  def deltasPerUser(readings: Dataset[Reading]): Dataset[ReadingDelta] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastSeen, ReadingDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: String, rows: Iterator[Reading], state: GroupState[LastSeen]) =>
          // Sort within the micro-batch: Kafka Streams sees offset order;
          // Structured Streaming makes no intra-batch order promise, so
          // event-time order is the well-defined contract.
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[ReadingDelta]
          var last = state.getOption
          for (r <- sorted) {
            out += ReadingDelta(userId, r.ts, r.value,
              last.map(_.value), last.map(l => r.value - l.value))
            last = Some(LastSeen(r.ts.getTime, r.value))
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  case class KeyedEvent(key: String, ts: java.sql.Timestamp, eventId: Long)
  case class LastTs(sec: Long)

  /** Streaming twin of the gated `stream_dedup_horizon` batch query:
    * bounded-state dedup over an event-time horizon. An event is a
    * duplicate iff the previous event with the same key (kept or NOT —
    * lag semantics, matching the batch window) lies within `horizonSec`.
    * State is ONE floor-second timestamp per key; in production add an
    * event-time timeout at the watermark so idle keys evict. Timestamps
    * floor to seconds exactly like the batch side's cast-to-long. */
  def gapDedup(events: Dataset[KeyedEvent], horizonSec: Long): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[LastTs, KeyedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[KeyedEvent], state: GroupState[LastTs]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.eventId))
          val out = scala.collection.mutable.ArrayBuffer.empty[KeyedEvent]
          var last = state.getOption.map(_.sec)
          for (r <- sorted) {
            val sec = Math.floorDiv(r.ts.getTime, 1000L)
            if (last.forall(p => sec - p > horizonSec)) out += r
            last = Some(sec) // last SEEN, kept or not — lag() semantics
          }
          last.foreach(s => state.update(LastTs(s)))
          out.iterator
      }
  }

  /** The same operator on the arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor`, Spark 4.x): typed
    * per-key `ValueState` handles with optional TTL replace the single
    * `GroupState` blob — the engine-current form of U1. Semantics are
    * identical to [[deltasPerUser]]; `StreamingSpec` asserts both paths
    * emit the same rows across micro-batches.
    */
  class DeltaProcessor extends StatefulProcessor[String, Reading, ReadingDelta] {
    @transient private var last: ValueState[LastSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastSeen](
        "last", Encoders.product[LastSeen], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Reading],
                                 timers: TimerValues): Iterator[ReadingDelta] = {
      val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
      val out = scala.collection.mutable.ArrayBuffer.empty[ReadingDelta]
      var prev = if (last.exists()) Some(last.get()) else None
      for (r <- sorted) {
        out += ReadingDelta(key, r.ts, r.value,
          prev.map(_.value), prev.map(l => r.value - l.value))
        prev = Some(LastSeen(r.ts.getTime, r.value))
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** [[deltasPerUser]] via `transformWithState` (state API v2). */
  def deltasPerUserV2(readings: Dataset[Reading]): Dataset[ReadingDelta] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.userId)
      .transformWithState(new DeltaProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
