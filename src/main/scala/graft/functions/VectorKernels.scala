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
  /** Boxed-nullable dot product, matching the declarative
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` on ALL inputs: unequal
    * lengths → zip_with pads with null → the fold result is null, and a
    * null element anywhere → null. Returning the boxed type lets the
    * expression surface SQL NULL instead of a silently-wrong partial sum.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
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
  // nullable even when both children are non-null: length mismatch or a
  // null ELEMENT yields SQL NULL (BinaryExpression's default would claim
  // non-null output for non-null children and mis-plan downstream)
  override def nullable: Boolean = true
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
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotResult")
      s"""java.lang.Double $tmp = graft.functions.VectorKernels.dot($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}""".stripMargin
    })
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
