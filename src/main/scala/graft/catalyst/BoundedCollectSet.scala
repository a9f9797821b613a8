package graft.catalyst

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Memory-bounded `collect_set` over BIGINT keys: accumulates distinct
  * values until one more than `cap` has been seen, then SATURATES — the
  * buffer stops growing and the group finishes as NULL.
  *
  * Why this exists: `collect_set(...)` followed by `size(...) <= cap`
  * builds the full per-key set BEFORE the filter can discard it, so one
  * hot key (a stop-word shingle shared by 10^8 documents at 100 TB)
  * accumulates an unbounded aggregation buffer and OOMs the executor —
  * the filter never runs. This aggregate enforces the cap DURING
  * accumulation: every partial buffer holds at most cap+1 elements, on
  * the map side, in the shuffle, and in the final merge, regardless of
  * key skew. NULL (not an oversized array) is the overflow signal, so
  * callers filter `isNotNull` and hot groups cost O(cap) memory total.
  *
  * A cap of Int.MaxValue never saturates in practice and restores exact
  * `collect_set` semantics (see [[graft.ops.DedupOps.MaxShingleFreq]]).
  *
  * Buffer is a flat Array[Long] with linear-probe dedup — at cap ≈ 100
  * a linear contains() over ≤101 longs beats any hash structure's
  * allocation + serialization cost, and `ExpressionEncoder[Array[Long]]`
  * gives a compact unsafe-row buffer encoding. Runs as a typed
  * `ScalaAggregator` (ObjectHashAggregate) with map-side partial merge,
  * same execution class as the built-in `collect_set`.
  */
class BoundedCollectSetAgg(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def saturated(buf: Array[Long]): Boolean = buf.length > cap

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    if (saturated(buf)) buf
    else {
      var i = 0
      while (i < buf.length) { if (buf(i) == x) return buf; i += 1 }
      buf :+ x
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (saturated(b1)) b1
    else if (saturated(b2)) b2
    else {
      var out = b1
      var i = 0
      while (i < b2.length && !saturated(out)) {
        out = reduce(out, b2(i))
        i += 1
      }
      out
    }
  }

  /** NULL = the group exceeded the cap (and was only ever partially
    * collected) — the overflow marker, not an empty set. */
  override def finish(buf: Array[Long]): Array[Long] =
    if (saturated(buf)) null else buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object BoundedCollectSet {
  /** Column form: `boundedCollectSet(col, cap)` — distinct values as
    * ARRAY<BIGINT>, or NULL once the group's distinct count exceeds cap. */
  def apply(c: Column, cap: Int): Column = {
    implicit val longEnc: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    udaf(new BoundedCollectSetAgg(cap)).apply(c)
  }
}
