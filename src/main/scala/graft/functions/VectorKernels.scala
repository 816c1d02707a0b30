package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Compiled vector kernel for the similarity family.
  *
  * The declarative dot product — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — runs as INTERPRETED eval (higher-order functions are CodegenFallback)
  * and allocates a zipped intermediate array per row. On q35's ~1.2M
  * candidate pairs × 64 dims that interpretation dominates the query. This
  * kernel is one compiled multiply-add loop, no allocation, and its
  * `doGenCode` is a static call so it stays inside whole-stage codegen.
  *
  * Summation order is the SAME sequential left fold as the declarative
  * form (((0 + x₀y₀) + x₁y₁) + …), so results are bit-identical to both
  * the previous formulation and the DuckDB oracle's `list_sum` — the
  * determinism contract survives the optimization.
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** (array<double>, array<double>) → double sequential-fold dot product
  * ([[VectorKernels.dot]]). `vec_dot(a, a)` is the squared norm.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dot($a, $b);")
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
