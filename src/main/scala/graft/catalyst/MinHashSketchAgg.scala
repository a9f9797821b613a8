package graft.catalyst

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.ops.DedupOps

/** Typed mergeable MinHash sketch aggregator (SURVEY.md §7.2's custom-
  * aggregate candidate): folds a stream of 60-bit shingle hashes into a
  * k-wide signature of per-permutation minima.
  *
  * Mergeability is the scale property: partial sketches combine by
  * element-wise min, so Spark runs it with map-side partial aggregation,
  * and the same sketch works incrementally in streaming state (a corpus
  * sketch is updatable one document at a time). Estimated Jaccard between
  * two groups = fraction of agreeing signature slots — k=128 gives
  * ±1/sqrt(128) ≈ 0.09 standard error.
  *
  * Same (a_i, b_i, p) constants as [[graft.ops.DedupOps]], so sketches are
  * comparable with the per-document SQL minhash and the DuckDB oracle.
  */
class MinHashSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val coeffs = DedupOps.minhashCoeffs(k).toArray
  private val P = DedupOps.P

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val x = h % P
    var i = 0
    while (i < k) {
      val (a, b) = coeffs(i)
      val v = (a * x + b) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object MinHashSketchAgg {
  /** Width of the registered `minhash_sketch` UDAF (and its oracle twin):
    * k=128 → ±1/sqrt(128) ≈ 0.09 standard error on estimated Jaccard —
    * a useful estimate, not just a smoke check. Shared by the SQL
    * registration and SketchQueries so the constants cannot drift. */
  val SketchK = 128

  /** Estimated Jaccard = fraction of agreeing slots. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }
}
