package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
