package graft.catalyst

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import graft.ops.DedupOps

/** Typed mergeable Count-Min Sketch aggregator (Cormode & Muthukrishnan
  * 2005) over 60-bit term hashes — the frequency-estimation member of the
  * sketch family (HLL = distinct, Bloom = membership, SpaceSaving =
  * top-k, MinHash = similarity; CMS = per-key counts): D hash rows × W
  * counters, [[CmsAgg.D]]·[[CmsAgg.W]]·8 bytes FOREVER no matter how many
  * occurrences fold in. Estimate for a key = min over rows of its
  * counter; since every occurrence increments exactly one counter per
  * row, estimates can only OVER-count (collisions), never under — the
  * dual of Bloom's no-false-negative guarantee, and the `no_undercount`
  * column the gate pins.
  *
  * Mergeability is element-wise sum, so Spark runs map-side partial
  * aggregation, and the same sketch updates incrementally (streaming
  * keyed state, per-snapshot unions — the HLL/SpaceSaving pattern).
  * Position derivation reuses the published LCG universal-hash
  * coefficients of [[graft.ops.DedupOps.minhashCoeffs]] (own seed), so
  * the DuckDB oracle can replay each counter cell as "sum of the exact
  * counts of all terms hashing there" — provably the same function the
  * sketch computes, pinning the semantics bit-for-bit.
  */
class CmsAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import CmsAgg._

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val x = h % P
    var i = 0
    while (i < D) {
      val (a, b) = Coeffs(i)
      val pos = (((a * x + b) % P) % W).toInt
      buf(i * W + pos) += 1L
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object CmsAgg {
  /** Sketch geometry: 4 rows × 16 counters. W sits deliberately BELOW
    * the gated corpus's 31-term vocab so every row genuinely collides and
    * the realized overcount is gate-visible, exactly like the Bloom
    * audit's FP arm — a W swallowing the whole vocab would gate a sketch
    * whose interesting arm never fires. A 100 TB deployment widens W
    * (ε ≈ e/W of the TOTAL stream count per estimate, δ ≈ e^−D); all
    * math below is geometry-parameterized, constants fixed only so Spark
    * and the oracle cannot drift. */
  val D: Int = 4
  val W: Int = 16
  val P: Long = DedupOps.P

  /** Row-hash coefficients: pos_i(x) = ((a_i·(x mod p) + b_i) mod p)
    * mod W. Seed distinct from the MinHash and Bloom families. */
  val Coeffs: Array[(Long, Long)] = DedupOps.minhashCoeffs(D, seed = 9494L).toArray

  /** The D counter positions of h — single source of truth for the Spark
    * reduce, the probe expression, and the oracle replay. */
  def positions(h: Long): Array[Int] =
    Coeffs.map { case (a, b) => (((a * (h % P) + b) % P) % W).toInt }

  /** Spark/DuckDB-shared position arithmetic per row (non-negative h on
    * both engines, so % is the true mod). */
  def positionSqls(hExpr: String): Seq[String] =
    Coeffs.toSeq.map { case (a, b) =>
      s"((($a * (($hExpr) % $P)) + $b) % $P) % $W"
    }

  /** Spark-SQL estimate probe against a one-row broadcast sketch column
    * `cmsCol` (ARRAY<BIGINT>, 1-based element_at): min over the D row
    * counters. Pure codegen arithmetic — no UDF, no driver collect. */
  def estimateSql(hExpr: String, cmsCol: String): String =
    positionSqls(hExpr).zipWithIndex.map { case (p, i) =>
      s"element_at($cmsCol, CAST(${i * W} + ($p) AS INT) + 1)"
    }.mkString("least(", ", ", ")")
}
