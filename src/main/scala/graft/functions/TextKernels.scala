package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text kernels for the dedup/fingerprint family.
  *
  * The declarative formulation of 3-token shingling —
  * `array_distinct(transform(sequence(...), i => concat_ws(element_at...)))`
  * — runs as INTERPRETED expression-tree eval (higher-order functions are
  * CodegenFallback), and after projection collapse each `element_at`
  * re-evaluates the inlined `split(text)` subtree: O(tokens²) string work
  * per document, which serialized the whole near-dup suite onto whatever
  * task count the scan stage had. A native expression does one split and
  * one hash-set pass per row in compiled Scala, and its `doGenCode` is a
  * single static call, so it stays inside whole-stage codegen.
  */
object TextKernels {
  private val SpacePattern = UTF8String.fromString(" ")

  /** Distinct 3-token shingles of `text` split on single spaces, SORTED in
    * binary (UTF8String) order — sorted output lets the intersection size
    * in the verify join be a linear merge-scan ([[sortedIntersectCount]])
    * instead of a hash-set build per pair. Split semantics match
    * `split(text, " ")` (regex split, limit -1: trailing empty tokens
    * dropped, consecutive spaces yield empty tokens) so the shingle SET is
    * identical to the DuckDB oracle's `string_split` formulation; no
    * consumer depends on element order.
    */
  def shingles3(text: UTF8String): ArrayData = {
    val toks = text.split(SpacePattern, -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.TreeSet[UTF8String]
    var i = 0
    while (i + 3 <= toks.length) {
      seen.add(UTF8String.concatWs(SpacePattern, toks(i), toks(i + 1), toks(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray().asInstanceOf[Array[Any]])
  }

  /** |A ∩ B| for two arrays of non-null UTF8Strings SORTED in binary order
    * (as produced by [[shingles3]]): single merge-scan, no hashing, no
    * boxing beyond the array accessors.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

/** (sorted string array, sorted string array) → |A ∩ B|
  * ([[TextKernels.sortedIntersectCount]]). Both inputs MUST be sorted in
  * binary order; [[ShingleSet]] guarantees that for shingle arrays.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<string>, array<string>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.sortedIntersectCount($a, $b);")
  override def prettyName: String = "sorted_intersect_count"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** string → array of distinct 3-token shingles ([[TextKernels.shingles3]]). */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles3(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingles3($c);")
  override def prettyName: String = "shingle_set"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
