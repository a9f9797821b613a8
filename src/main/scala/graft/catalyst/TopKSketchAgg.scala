package graft.catalyst

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory frequent-items (heavy hitters) buffer: at most
  * `capacity` (term, count) entries, SpaceSaving eviction. */
case class TopKBuf(keys: Array[String], counts: Array[Long])

/** SpaceSaving heavy-hitters sketch as a typed mergeable Aggregator —
  * the frequent-items member of the sketch family beside HLL
  * (approx distinct), approx_percentile (quantiles), and
  * [[MinHashSketchAgg]] (set similarity).
  *
  * Why a sketch and not `GROUP BY term`: the exact answer shuffles one
  * row per distinct (group, term) — at 100 TB with an open vocabulary
  * that IS the corpus. The sketch shuffles at most `capacity` entries
  * per group per map partition (map-side partial merge), a bound that
  * holds no matter how the vocabulary grows, and the same merge makes it
  * streaming-updatable state (one sketch per key in a stateful op).
  *
  * Semantics (classic SpaceSaving guarantees):
  *  - if a group's distinct-term count never exceeds `capacity`
  *    (including during merges), every count is EXACT — the gated query
  *    runs in this regime (capacity 256 vs a 31-term vocabulary) so the
  *    DuckDB exact-count oracle matches bit-for-bit;
  *  - beyond capacity, an arriving unseen term evicts the current
  *    minimum and inherits its count as overestimate: reported counts
  *    are within min-count of truth, and any term with true frequency
  *    > N/capacity is guaranteed present.
  *
  * The buffer is two parallel arrays with linear probing — at
  * capacity ≲ a few hundred, scanning beats any hash structure once
  * encoder serialization is in the picture.
  *
  * Output: entries sorted by (count desc, term asc) — a deterministic
  * presentation order callers can explode into flat ranked rows.
  */
class TopKSketchAgg(capacity: Int)
    extends Aggregator[String, TopKBuf, Seq[(String, Long)]] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  /** Core accumulate: add `c` occurrences of `term`. */
  private def add(b: TopKBuf, term: String, c: Long): TopKBuf = {
    var i = 0
    while (i < b.keys.length) {
      if (b.keys(i) == term) { b.counts(i) += c; return b }
      i += 1
    }
    if (b.keys.length < capacity)
      TopKBuf(b.keys :+ term, b.counts :+ c)
    else {
      // SpaceSaving eviction: the new term replaces the current minimum
      // and inherits its count (the overestimate that bounds the error).
      var mi = 0
      i = 1
      while (i < b.counts.length) { if (b.counts(i) < b.counts(mi)) mi = i; i += 1 }
      b.keys(mi) = term
      b.counts(mi) += c
      b
    }
  }

  override def reduce(b: TopKBuf, term: String): TopKBuf = add(b, term, 1L)

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var out = b1
    var i = 0
    while (i < b2.keys.length) { out = add(out, b2.keys(i), b2.counts(i)); i += 1 }
    out
  }

  override def finish(b: TopKBuf): Seq[(String, Long)] =
    b.keys.indices.map(i => (b.keys(i), b.counts(i)))
      .sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[TopKBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKBuf]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKSketch {
  /** Column form: `TopKSketch(col, capacity)` — array<struct<_1 term,
    * _2 count>> sorted by (count desc, term asc). */
  def apply(c: Column, capacity: Int): Column = {
    implicit val strEnc: Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    udaf(new TopKSketchAgg(capacity)).apply(c)
  }
}
