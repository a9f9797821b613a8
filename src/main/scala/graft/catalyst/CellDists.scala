package graft.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `cell_dists(vm, cents)` — exact integer L2 distances of one
  * micro-unit vector against a literal centroid matrix, in one tight
  * loop. Returns ARRAY<BIGINT> of Σ(vmᵢ−cᵢ)² per centroid row.
  *
  * Why a native Expression (the [[ArrayDotProduct]]/[[PqEncode]]
  * precedent): the composed-builtin form
  * `transform(centsLit, c -> aggregate(zip_with(vm, c, (a,b)->(a-b)²),
  * 0L, +))` evaluates k·dim BOXED lambda steps per row — and, far
  * worse, every column referenced inside a lambda body is INLINED by
  * the optimizer (alias substitution during filter/column pushdown
  * ignores reuse), so when `vm` is itself the normalize→micro HOF
  * chain the whole chain re-evaluated once PER CELL, and the norm
  * inside it once per element (measured: the trained-IVF query's
  * assignment dominated the gate at ~64× redundant work). Here `vm`
  * is this expression's single child: it is evaluated once per call
  * no matter what the optimizer inlines, and the k×dim distance loop
  * runs on primitive longs.
  *
  * Bit-parity contract with the HOF tree it replaces (oracle twins
  * unchanged):
  *  - plain Long arithmetic — same wraparound behavior on overflow;
  *  - a null input vector yields an array of k NULLs (transform over
  *    the non-null literal produced exactly that);
  *  - a null element or a length mismatch with a centroid row yields
  *    NULL for that cell (zip_with pads with null; null propagates
  *    through the sum).
  */
case class CellDists(vm: Expression, centsLit: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vm, centsLit)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellDists =
    copy(vm = newChildren(0), centsLit = newChildren(1))

  /** Centroid rows as primitive arrays, materialized once per plan. */
  @transient private lazy val cents: Array[Array[Long]] = {
    val ad = centsLit.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    vm.dataType match {
      case ArrayType(LongType, _) =>
      case t => return TypeCheckResult.TypeCheckFailure(
        s"cell_dists expects array<bigint> vector, got ${t.simpleString}")
    }
    if (!centsLit.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "cell_dists centroids must be a literal")
    centsLit.dataType match {
      case ArrayType(ArrayType(LongType, _), _) =>
      case t => return TypeCheckResult.TypeCheckFailure(
        s"cell_dists centroids must be array<array<bigint>>, got ${t.simpleString}")
    }
    if (cents.isEmpty)
      return TypeCheckResult.TypeCheckFailure("cell_dists: empty centroid set")
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  /** The result array itself is never null (see the null contract). */
  override def nullable: Boolean = false

  private def elemNullable: Boolean =
    vm.dataType.asInstanceOf[ArrayType].containsNull

  override def eval(input: InternalRow): Any = {
    val a = vm.eval(input)
    val k = cents.length
    if (a == null)
      return new GenericArrayData(Array.fill[Any](k)(null))
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var anyNull = false
    if (elemNullable) {
      var i = 0
      while (i < n && !anyNull) { if (x.isNullAt(i)) anyNull = true; i += 1 }
    }
    val xs = if (anyNull) null else x.toLongArray()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      if (anyNull || c.length != n) out(j) = null
      else {
        var s = 0L
        var i = 0
        while (i < n) { val dd = xs(i) - c(i); s += dd * dd; i += 1 }
        out(j) = s
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "cell_dists"
}
