package graft.catalyst

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bitwise-OR fold over ARRAY<BIGINT> bitmaps (elementwise `|`,
  * ragged inputs zero-extended) — the per-node reduction of a
  * bit-parallel multi-source BFS: each of S seeds owns one bit, a
  * node's aggregation buffer is the ceil(S/64)-word set of seeds
  * that reach it, and OR-ing the frontier's incoming bitmaps per
  * destination is this aggregate.
  *
  * Why this exists: a row-keyed multi-source BFS materializes
  * Θ(S·n) (seed, node) rows — the iFUB fringe scan's published
  * worst case on expander graphs (near-APSP state). Bit-packing
  * collapses that to Θ(S·n/64) WORDS that live inside an ordinary
  * hash aggregation: map-side partial OR, shuffle of one bitmap per
  * (partition, node), final OR — the same execution class as the
  * built-in `sum`, with per-group buffers bounded by the word count
  * regardless of how many frontier edges hit a node.
  *
  * Buffer mutates b1 in place when it is long enough (Aggregator
  * buffers are private copies) and grows to max(|a|,|b|) otherwise;
  * an empty array is the zero. */
class BitOrAggImpl extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b.clone()
    val (big, small) = if (a.length >= b.length) (a, b) else (b.clone(), a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  override def reduce(buf: Array[Long], x: Array[Long]): Array[Long] =
    or(buf, if (x == null) Array.emptyLongArray else x)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    or(b1, b2)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object BitOrAgg {
  /** Column form: `BitOrAgg(col)` — elementwise OR of ARRAY<BIGINT>
    * bitmaps, ragged inputs zero-extended, empty array as zero. */
  def apply(c: Column): Column = {
    implicit val enc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    udaf(new BitOrAggImpl).apply(c)
  }
}
