package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** (bloom_bytes, key) → bool membership probe against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (Spark's public sketch —
  * the same family its runtime-filter injection uses).
  *
  * The filter bytes must be a FOLDABLE expression (a literal): the filter
  * is deserialized once per executor into a transient lazy field, and
  * `doGenCode` pins that deserialized object in the codegen references
  * array, so the per-row work inside whole-stage codegen is exactly one
  * `mightContainLong` bit probe — no per-row deserialization, no UDF
  * boxing. The long key must have been inserted with `putLong` (the
  * `DataFrameStatFunctions.bloomFilter` path for long columns), which
  * keeps the hash function pair consistent on both sides.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        // A null-valued foldable filter would otherwise pass here and NPE
        // later inside the lazy deserialization at planning/codegen time,
        // far from the call site — reject it with a typed error instead.
        if (left.eval(null) == null) TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain filter literal must not be null")
        else TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects a foldable (literal) filter")
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary literal, bigint), got $other")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $ref.mightContainLong($v);")
  }

  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
