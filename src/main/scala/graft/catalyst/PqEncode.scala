package graft.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pq_encode(vec, centroids, m, mode)` — product-quantization encoding
  * of one vector against a literal codebook, in a single tight loop.
  *
  * Why a native Expression (SURVEY.md §7.2): the composed-builtin form
  * (an `array_min(array(struct(round(array_dot(slice...)...))))` per
  * subspace) is semantically right but builds an m×k×2-`array_dot`
  * expression tree — 1024 nodes at m=16, k=32 — whose per-EXECUTION
  * planning/codegen overhead measured ~3.5 s per giant Project at
  * sf0.01 (10-row LUT input, so provably not data cost). This
  * expression computes the identical m×k distance table inside one
  * codegen'd call: tree size is O(1), per-row work is the same
  * m×dim multiply-adds.
  *
  * Bit-parity contract with the tree it replaces (and so with the
  * unchanged DuckDB oracle):
  *  - subspace distance = `round((dot(sub,sub) + ‖c_sub‖²) - 2·dot(sub,c_sub), 6)`
  *    with left-to-right double accumulation (the [[ArrayDotProduct]]
  *    order) and ‖c_sub‖² folded left-to-right driver-side;
  *  - `round(_, 6)` replicates Spark's `Round` on DOUBLE:
  *    `BigDecimal.valueOf(x).setScale(6, HALF_UP)`, NaN/Inf passthrough;
  *  - argmin tie-break replicates `array_min` over `struct(d, k)`:
  *    `java.lang.Double.compare` ordering (NaN largest, -0.0 < 0.0),
  *    first (smallest) ki wins ties;
  *  - LUT entries are `floor(d * 1e6 + 0.5)` as BIGINT micro-units.
  *
  * Modes: `codes` → ARRAY<INT> (m argmin code ids); `lut` →
  * ARRAY<ARRAY<BIGINT>> (m×k micro-unit distance table); `mins` →
  * ARRAY<STRUCT<d DOUBLE, k INT>> (per-subspace min distance + code,
  * the storage-quantization shape that also feeds the error audit).
  *
  * NULL on a null/len-mismatched input vector or any null element (the
  * tree form instead produced per-subspace null structs on these
  * corners; no gated corpus has them — embeddings are fixed-dim,
  * non-null).
  */
case class PqEncode(vec: Expression, centsLit: Expression,
                    mLit: Expression, modeLit: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(vec, centsLit, mLit, modeLit)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncode =
    copy(vec = newChildren(0), centsLit = newChildren(1),
      mLit = newChildren(2), modeLit = newChildren(3))

  @transient private lazy val mode: String =
    modeLit.eval().asInstanceOf[UTF8String].toString
  @transient private lazy val m: Int =
    mLit.eval().asInstanceOf[Number].intValue()
  /** Codebook rows (k full-dim vectors), materialized once per plan. */
  @transient private[catalyst] lazy val cents: Array[Array[Double]] = {
    val ad = centsLit.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val d: Int = cents(0).length / m
  /** c2(ki)(mi) = left-to-right sum of squares of centroid ki's
    * subspace-mi slice — the driver-side constant of the expansion. */
  @transient private[catalyst] lazy val c2: Array[Array[Double]] =
    cents.map { c =>
      Array.tabulate(m) { mi =>
        var a = 0.0; var j = mi * d; val e = j + d
        while (j < e) { a += c(j) * c(j); j += 1 }
        a
      }
    }

  private def vecOk: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!vecOk) return TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>/array<double> vector, got ${vec.dataType.simpleString}")
    if (!centsLit.foldable || !mLit.foldable || !modeLit.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "pq_encode centroids/m/mode must be literals")
    centsLit.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
      case t => return TypeCheckResult.TypeCheckFailure(
        s"pq_encode centroids must be array<array<double>>, got ${t.simpleString}")
    }
    if (cents.isEmpty)
      return TypeCheckResult.TypeCheckFailure("pq_encode: empty codebook")
    if (cents(0).length % m != 0)
      return TypeCheckResult.TypeCheckFailure(
        s"pq_encode: dim=${cents(0).length} not divisible by m=$m")
    if (!PqEncode.Modes.contains(mode))
      return TypeCheckResult.TypeCheckFailure(
        s"pq_encode: mode must be one of ${PqEncode.Modes.mkString("/")}, got $mode")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = mode match {
    case "codes" => ArrayType(IntegerType, containsNull = false)
    case "lut" =>
      ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
    case _ => ArrayType(StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("k", IntegerType, nullable = false))), containsNull = false)
  }

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemNullable: Boolean =
    vec.dataType.asInstanceOf[ArrayType].containsNull

  private def modeId: Int = PqEncode.Modes.indexOf(mode)

  override def eval(input: InternalRow): Any = {
    val a = vec.eval(input)
    if (a == null) null
    else PqEncode.compute(a.asInstanceOf[ArrayData], cents, c2, m, d,
      elemIsFloat, elemNullable, modeId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[][]")
    val childGen = vec.genCode(ctx)
    val out = ctx.freshName("pqOut")
    val ad = classOf[ArrayData].getName
    val resultCode =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        $ad ${ev.value} = null;
        if (!${childGen.isNull}) {
          $ad $out = graft.catalyst.PqEncode.compute(
            ${childGen.value}, $centsRef, $c2Ref, $m, $d,
            $elemIsFloat, $elemNullable, $modeId);
          if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
        }
      """
    ev.copy(code = resultCode)
  }

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  val Modes: Seq[String] = Seq("codes", "lut", "mins")

  /** Spark `Round` on DOUBLE at scale 6: NaN/Inf passthrough, else
    * shortest-decimal BigDecimal HALF_UP. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One vector → codes / LUT / mins. Called from both eval and
    * generated code; returns null on length mismatch or null element. */
  def compute(arr: ArrayData, cents: Array[Array[Double]],
              c2: Array[Array[Double]], m: Int, d: Int,
              isFloat: Boolean, elemNullable: Boolean,
              mode: Int): ArrayData = {
    val n = m * d
    if (arr.numElements() != n) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (elemNullable && arr.isNullAt(i)) return null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val k = cents.length
    val codes = if (mode != 1) new Array[Int](m) else null
    val minD = if (mode == 2) new Array[Double](m) else null
    val lut = if (mode == 1) new Array[Any](m) else null
    var mi = 0
    while (mi < m) {
      val o = mi * d
      var ss = 0.0
      var j = 0
      while (j < d) { val x = v(o + j); ss += x * x; j += 1 }
      val row = if (mode == 1) new Array[Long](k) else null
      var bestD = 0.0
      var bestK = -1
      var ki = 0
      while (ki < k) {
        val c = cents(ki)
        var sc = 0.0
        j = 0
        while (j < d) { sc += v(o + j) * c(o + j); j += 1 }
        val dist = round6((ss + c2(ki)(mi)) - 2.0 * sc)
        if (mode == 1) row(ki) = math.floor(dist * 1e6 + 0.5).toLong
        else if (bestK < 0 || java.lang.Double.compare(dist, bestD) < 0) {
          bestD = dist; bestK = ki
        }
        ki += 1
      }
      if (mode == 1) lut(mi) = new GenericArrayData(row)
      else { codes(mi) = bestK; if (mode == 2) minD(mi) = bestD }
      mi += 1
    }
    mode match {
      case 0 => new GenericArrayData(codes)
      case 1 => new GenericArrayData(lut)
      case _ => new GenericArrayData(Array.tabulate[Any](m)(mi =>
        InternalRow(minD(mi), codes(mi))))
    }
  }
}
