package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expressions for the ingest wire formats. All three
  * generate straight-line Java in `doGenCode`, so they stay inside
  * whole-stage codegen — no UDF boxing, no interpreted fallback on the
  * per-record hot path (the ingest equivalent of the reference's
  * serializer interfaces, /root/reference/…/kafka_producer.go:71-91).
  */

/** bytes → Avro-binary logLine (see [[AvroCodec]]). */
case class AvroLogLineEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 5 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avro_logline expects struct(line,source,tag,logtypeid,timings), got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    AvroCodec.encodeStruct(input.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AvroCodec.encodeStruct($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bytes → proto2 LogLine (see [[ProtoCodec]]). */
case class ProtoLogLineEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 5 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"proto_logline expects struct(line,source,tag,logtypeid,timings), got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    ProtoCodec.encodeStruct(input.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ProtoCodec.encodeStruct($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** binary → logLine struct: inverse of [[AvroLogLineEncode]] (O22). */
case class AvroLogLineDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AvroCodec.inputSchema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avro_logline_decode expects binary, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    AvroCodec.decodeStruct(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AvroCodec.decodeStruct($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kafka v0 message-set decode (incl. gzip/snappy nested sets) —
  * binary → array<struct<offset, key, value>>; the consumer-side wire
  * path of [[graft.ingest.MessageSet]]. Per-BATCH work (one fetch
  * payload → many rows), so eval-per-value with a codegen passthrough
  * is the right cost profile.
  */
case class KafkaMessageSetDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = KafkaMessageSetDecode.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kafka_message_set_decode expects binary, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    KafkaMessageSetDecode.decodeCatalyst(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KafkaMessageSetDecode.decodeCatalyst($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KafkaMessageSetDecode {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true))), containsNull = false)

  def decodeCatalyst(bytes: Array[Byte]): GenericArrayData =
    new GenericArrayData(graft.ingest.MessageSet.decode(bytes).map { e =>
      new GenericInternalRow(Array[Any](e.offset, e.key, e.value))
    }.toArray[Any])
}

/** FNV-1a 32-bit over a binary column — byte-parity with the reference's
  * hash partitioner (V:elodina/siesta-producer/partitioner.go:15-44).
  * Codegen inlines the multiply-xor loop directly into the stage.
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 expects binary, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    Fnv1a32.hash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |int $h = ${Fnv1a32.OffsetBasis};
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $h ^= ($c[$i] & 0xff);
         |  $h *= ${Fnv1a32.Prime};
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fnv1a32 {
  final val OffsetBasis: Int = 0x811c9dc5 // 2166136261
  final val Prime: Int = 16777619

  def hash(bytes: Array[Byte]): Int = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= Prime
      i += 1
    }
    h
  }
}
