package graft.catalyst

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import graft.ops.DedupOps

/** Typed mergeable Bloom-filter aggregator over 60-bit shingle hashes —
  * the bounded-memory replacement for broadcasting an exact shingle SET
  * in decontamination checks (`DedupOps.contamination` broadcasts the
  * distinct eval shingles; at 100 TB an eval suite's shingle universe can
  * reach 10⁹ entries, but this bitset stays at [[BloomSetAgg.BloomBits]]
  * bits NO MATTER how many shingles fold in).
  *
  * Mergeability is bitwise OR, so Spark runs it with map-side partial
  * aggregation and the same filter is updatable incrementally (streaming
  * state, or per-corpus-snapshot unions). Membership is deterministic:
  * h is (maybe) present iff ALL [[BloomSetAgg.K]] derived bit positions
  * are set — false positives possible, false negatives impossible. The
  * position derivation reuses the published LCG-derived universal-hash
  * coefficients of [[graft.ops.DedupOps.minhashCoeffs]] (distinct seed)
  * so the DuckDB oracle can replay the exact same positions as a
  * position-SET membership test: the two formulations are provably the
  * same function, which is what the gate pins.
  */
class BloomSetAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import BloomSetAgg._

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val x = h % P
    var i = 0
    while (i < K) {
      val (a, b) = Coeffs(i)
      val pos = (((a * x + b) % P) % BloomBits).toInt
      buf(pos >> 6) |= (1L << (pos & 63))
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object BloomSetAgg {
  /** Filter geometry. 2¹⁶ bits = 8 KiB per filter — sized for the gated
    * corpora (sf0.1 eval slice sets ~25% of the bits → per-probe FP rate
    * ≈ 0.25⁴ ≈ 0.4%, and the audit output carries the exact twin so the
    * realized FP count is gate-visible). A 100 TB deployment scales
    * BloomBits to its eval-shingle cardinality (m ≈ 14.4·n bits for 0.1%
    * FP); the aggregate and the membership expression are geometry-
    * parameterized in all the math below, constants fixed here only so
    * Spark and the oracle cannot drift. */
  val BloomBits: Int = 1 << 16
  val Words: Int = BloomBits / 64
  /** Probes per element. */
  val K: Int = 4
  val P: Long = DedupOps.P

  /** Position-derivation coefficients: h_i(x) = ((a_i·(x mod p) + b_i)
    * mod p) mod m. Seed differs from the MinHash permutations so the two
    * families stay independent. */
  val Coeffs: Array[(Long, Long)] = DedupOps.minhashCoeffs(K, seed = 4242L).toArray

  /** The K bit positions of h — the single source of truth the Spark
    * bitset test, the SQL membership expression, and the oracle replay
    * all derive from. */
  def positions(h: Long): Array[Int] =
    Coeffs.map { case (a, b) => (((a * (h % P) + b) % P) % BloomBits).toInt }

  /** Spark/DuckDB-shared position arithmetic over a BIGINT column
    * expression (both engines: non-negative h, so % is the true mod). */
  def positionSqls(hExpr: String): Seq[String] =
    Coeffs.toSeq.map { case (a, b) =>
      s"((($a * (($hExpr) % $P)) + $b) % $P) % $BloomBits"
    }

  /** Spark-SQL membership predicate against a one-row broadcast bitset
    * column `bitsCol` (ARRAY<BIGINT>, 1-based element_at): ALL K derived
    * bits set. Pure codegen arithmetic — no UDF, no driver collect. */
  def memberSql(hExpr: String, bitsCol: String): String =
    positionSqls(hExpr).map { p =>
      s"((element_at($bitsCol, CAST(($p) DIV 64 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST(($p) % 64 AS INT))) != 0)"
    }.mkString("(", " AND ", ")")
}
