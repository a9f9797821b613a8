package graft.catalyst

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values, "bottom-k") distinct sketch as a typed mergeable
  * Aggregator: the state is the k smallest DISTINCT hash values seen, kept
  * sorted ascending. With hashes uniform on [0, M) the k-th smallest order
  * statistic estimates the distinct count as (k-1) * M / h_k (Bar-Yossef
  * et al., "Counting distinct elements in a data stream", RANDOM 2002),
  * with relative error ~1/sqrt(k-2).
  *
  * Why this beside HLL (`q_hll_partial_merge`, `sketch_overlap_matrix`):
  * a KMV sketch is a deterministic, engine-independent FUNCTION of the
  * input value set — same hashes in, same k values out, no
  * implementation-defined register layout. The correctness gate can
  * therefore pin the sketch and its estimate EXACTLY against a DuckDB
  * window-rank twin (hash-exact, not a tolerance bound), which no HLL
  * implementation allows. KMV sketches are also closed under set ops the
  * way registers are not: union = bottom-k of the concatenated sketches
  * (exactly the bottom-k of the union, since every globally-small value
  * is small within its own source), which the gate proves by re-running
  * the aggregator OVER per-source sketch contents.
  *
  * Scale shape: reduce is an insert-if-smaller into a bounded sorted
  * array (O(log k) search + O(k) shift, k rows of state per group);
  * merge is a sorted-array merge keeping k. Both run map-side, so a
  * petabyte corpus folds to k longs per group before the exchange —
  * the same partial-aggregation wire shape as Spark's own
  * approx_count_distinct, but with a gate-provable result.
  */
class KmvSketchAgg(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    val n = buf.length
    if (n == k && x >= buf(n - 1)) return buf
    var i = java.util.Arrays.binarySearch(buf, x)
    if (i >= 0) return buf // already present: DISTINCT semantics
    i = -i - 1 // insertion point
    val m = if (n < k) n + 1 else k
    val out = new Array[Long](m)
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = x
    System.arraycopy(buf, i, out, i + 1, m - i - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var (i, j, o) = (0, 0, 0)
    var last = Long.MinValue
    var first = true
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val t = a(i); i += 1; t }
        else { val t = b(j); j += 1; t }
      if (first || v != last) { out(o) = v; o += 1; last = v; first = false }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object KmvSketchAgg {
  /** Sketch size. 256 gives ~1/sqrt(254) ≈ 6.3% rsd; the gate compares
    * the ESTIMATE exactly (both engines compute the same integer), so k
    * only trades accuracy against state, not gate tightness. */
  val SketchK = 256

  /** Hash-space size for [[graft.ops.TextOps.hash64]]: 60-bit md5
    * prefix, uniform on [0, 2^60). */
  val HashSpace: Long = 1L << 60

  def kmvSketch(c: Column, k: Int = SketchK): Column = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    udaf(new KmvSketchAgg(k)).apply(c)
  }

  /** Distinct-count estimate from a sketch array column: exact count
    * when the set never filled the sketch, else (k-1)*M div h_k in
    * 128-bit DECIMAL intermediate (the product overflows 64 bits),
    * surfaced as BIGINT. Floor division on both engines. */
  def estimateExpr(sketchCol: String, k: Int = SketchK): String =
    s"""CASE WHEN size($sketchCol) < $k THEN CAST(size($sketchCol) AS BIGINT)
        ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $HashSpace)
                  div element_at($sketchCol, $k) AS BIGINT) END"""

  /** DuckDB twin of [[estimateExpr]] over a LIST(BIGINT) sketch. */
  def estimateSql(sketchExpr: String, k: Int = SketchK): String =
    s"""CASE WHEN len($sketchExpr) < $k THEN CAST(len($sketchExpr) AS BIGINT)
        ELSE CAST((CAST(${k - 1} AS HUGEINT) * $HashSpace)
                  // ($sketchExpr)[$k] AS BIGINT) END"""
}
