package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) interpret the
  * lambda per ELEMENT — fine for one scan, ruinous inside an O(n²) pair
  * join. These expressions evaluate once per ROW with a tight primitive
  * loop over the ArrayData (no per-element closures, no intermediate
  * product arrays), preserving bit-identical results to the sequential
  * left-fold the HOF forms compute (same accumulation order, same
  * float→double widening) — so DuckDB oracle parity is unchanged.
  */
private[functions] trait VecBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  private def isNumArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumArray(left.dataType) && isNumArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} needs array<float>/array<double> args, " +
        s"got ${left.dataType} / ${right.dataType}")

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** dot(a, b) = Σ aᵢ·bᵢ in double, sequential accumulation. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryOp {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = leftIsFloat
    val rf = rightIsFloat
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, i, lf) * elem(b, i, rf); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass cosine: dot, |a|², |b|² in a single loop, then
  * dot / (sqrt(na)·sqrt(nb)) — same combination order as the HOF form
  * `dot / (l2Norm(a) * l2Norm(b))`. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryOp {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = leftIsFloat
    val rf = rightIsFloat
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, lf)
      val y = elem(b, i, rf)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
