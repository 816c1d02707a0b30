package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled proto2 encoder for the reference's `LogLine` message
  * (/root/reference/proto/logline.proto:3-16), from the public protobuf
  * wire spec:
  *
  * {{{
  * message LogLine {
  *   message Tag { required string key = 1; required string value = 2; }
  *   required string line      = 1;   // tag 0x0A (field 1, wire 2)
  *   optional string source    = 2;   // tag 0x12
  *   repeated Tag    tag       = 3;   // tag 0x1A, length-delimited msgs
  *   optional int64  logtypeid = 4;   // tag 0x20, varint (omit if unset)
  *   repeated int64  timings   = 5;   // tag 0x28 per element (proto2
  * }                                  //   repeated scalars are UNPACKED)
  * }}}
  *
  * Field presence mirrors the reference's population rule
  * (/root/reference/syslog.go:163-182): line and source always set,
  * logtypeid only when the flag was given, timings = [receiveMs,
  * produceMs].
  */
object ProtoCodec {
  import AvroCodec.Buf

  /** Catalyst-side input schema for the proto_logline expression. */
  val inputSchema: StructType = StructType(Seq(
    StructField("line", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("tag", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false))), containsNull = false),
      nullable = true),
    StructField("logtypeid", LongType, nullable = true),
    StructField("timings", ArrayType(LongType, containsNull = false),
      nullable = true)))

  /** Unsigned base-128 varint (no zigzag — proto int64 is two's
    * complement, negative values take 10 bytes).
    */
  def writeVarint(b: Buf, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      b.put(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    b.put(v.toByte)
  }

  private def writeLenDelim(b: Buf, tag: Int, bytes: Array[Byte]): Unit = {
    b.put(tag.toByte)
    writeVarint(b, bytes.length.toLong)
    b.putAll(bytes)
  }

  private def writeStrField(b: Buf, tag: Int, s: UTF8String): Unit =
    writeLenDelim(b, tag, s.getBytes)

  /** Encode one LogLine from an InternalRow shaped as [[inputSchema]]. */
  def encodeStruct(row: InternalRow): Array[Byte] = {
    val b = new Buf(128)
    writeStrField(b, 0x0A, row.getUTF8String(0)) // line (required)
    if (!row.isNullAt(1)) writeStrField(b, 0x12, row.getUTF8String(1))
    if (!row.isNullAt(2)) {
      val tags = row.getArray(2)
      var i = 0
      while (i < tags.numElements()) {
        val t = tags.getStruct(i, 2)
        val inner = new Buf(32)
        writeStrField(inner, 0x0A, t.getUTF8String(0))
        writeStrField(inner, 0x12, t.getUTF8String(1))
        writeLenDelim(b, 0x1A, inner.result())
        i += 1
      }
    }
    if (!row.isNullAt(3)) { b.put(0x20.toByte); writeVarint(b, row.getLong(3)) }
    if (!row.isNullAt(4)) {
      val ts = row.getArray(4)
      var i = 0
      while (i < ts.numElements()) {
        b.put(0x28.toByte)
        writeVarint(b, ts.getLong(i))
        i += 1
      }
    }
    b.result()
  }
}
