package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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

  /** Sub-codebook argmin over a packed per-coarse-cell codebook: for each
    * entry (sid, cv) compute the integer squared L2 distance Σ(qvᵢ−cvᵢ)²
    * and return the minimum as (d2, sid), ties to the LOWEST sid — the
    * same total order as `min(struct(d2, sid))` and the DuckDB oracle's
    * `ORDER BY d2, sid` window. One compiled loop per row — the hot inner
    * op of the two-level semantic-codebook assignment (q103 family), where
    * the declarative form (transform + nested aggregate folds) would run
    * interpreted per element.
    *
    * Null contract: empty/absent codebook, a null entry, a null element,
    * or a length mismatch → SQL NULL (never a silently-partial argmin).
    */
  def subArgmin(qv: ArrayData, packed: ArrayData): InternalRow = {
    val k = packed.numElements()
    if (k == 0) return null
    val n = qv.numElements()
    var bestD2 = 0L
    var bestSid = 0L
    var found = false
    var j = 0
    while (j < k) {
      if (packed.isNullAt(j)) return null
      val e = packed.getStruct(j, 2)
      if (e.isNullAt(0) || e.isNullAt(1)) return null
      val sid = e.getLong(0)
      val cv = e.getArray(1)
      if (cv.numElements() != n) return null
      var d2 = 0L
      var i = 0
      while (i < n) {
        if (qv.isNullAt(i) || cv.isNullAt(i)) return null
        val diff = qv.getLong(i) - cv.getLong(i)
        d2 += diff * diff
        i += 1
      }
      if (!found || d2 < bestD2 || (d2 == bestD2 && sid < bestSid)) {
        found = true; bestD2 = d2; bestSid = sid
      }
      j += 1
    }
    InternalRow(bestD2, bestSid)
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

/** (array<long> qv, array<struct<sid: long, cv: array<long>>>) →
  * struct<d2: long, sid: long>: compiled argmin over a packed sub-codebook
  * ([[VectorKernels.subArgmin]]). The codebook side comes from a per-
  * coarse-cell equi-join, so the expression itself is K-independent —
  * exactly the property the round-8 K-inlined-literal assignment lacked.
  */
case class SubArgmin(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("sid", LongType, nullable = false)))
  // nullable on non-null children: empty codebook, null element, or a
  // dims mismatch yields SQL NULL (see the kernel's null contract)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
          ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(LongType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "sub_argmin expects (array<bigint>, " +
          s"array<struct<bigint, array<bigint>>>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.subArgmin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("argminResult")
      s"""org.apache.spark.sql.catalyst.InternalRow $tmp =
         |  graft.functions.VectorKernels.subArgmin($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}""".stripMargin
    })
  override def prettyName: String = "sub_argmin"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
