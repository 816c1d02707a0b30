package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled Avro binary encoder for the reference's fixed `logLine`
  * schema (/root/reference/avro/logline.avsc:1-56), written from the
  * public Avro 1.x binary-encoding spec:
  *
  *  - long/int: zigzag + base-128 varint
  *  - string/bytes: varint byte length + UTF-8 bytes
  *  - union ["null", T]: varint branch index (0 = null, 1 = T), then value
  *  - map/array: varint block count, entries, then a 0 terminator block;
  *    an empty collection is the single byte 0x00
  *  - record: field values in schema order, no framing
  *
  * All five logLine fields are nullable unions with default null; timings
  * is array<record Timing{eventName: string, value: long}>. The encoder
  * takes Catalyst's `InternalRow` directly so the [[AvroLogLineEncode]]
  * expression stays inside whole-stage codegen with zero row conversion.
  *
  * Deviation from the reference (documented): Go map iteration order is
  * randomized, so the reference's tag-map byte order is nondeterministic
  * run-to-run; we emit tags in the order of the map column (callers build
  * it key-sorted), a deterministic refinement of the same wire format.
  */
object AvroCodec {

  /** Catalyst-side input schema for the avro_logline expression. */
  val inputSchema: StructType = StructType(Seq(
    StructField("line", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("tag", MapType(StringType, StringType), nullable = true),
    StructField("logtypeid", LongType, nullable = true),
    StructField("timings", ArrayType(StructType(Seq(
      StructField("eventName", StringType, nullable = false),
      StructField("value", LongType, nullable = false))), containsNull = false),
      nullable = true)))

  /** The logLine schema JSON (for registry registration / from_avro). */
  val schemaJson: String =
    """{"type":"record","name":"logLine","fields":[
      |{"name":"line","type":["null","string"],"default":null},
      |{"name":"source","type":["null","string"],"default":null},
      |{"name":"tag","type":["null",{"type":"map","values":"string"}],"default":null},
      |{"name":"logtypeid","type":["null","long"],"default":null},
      |{"name":"timings","type":["null",{"type":"array","items":
      |{"type":"record","name":"Timing","fields":[
      |{"name":"eventName","type":"string"},
      |{"name":"value","type":"long"}]}}],"default":null}]}""".stripMargin
      .replace("\n", "")

  /** Growable output buffer (no java.io overhead in the row hot path). */
  final class Buf(initialSize: Int) {
    var arr: Array[Byte] = new Array[Byte](initialSize)
    var len: Int = 0
    def ensure(n: Int): Unit = {
      if (len + n > arr.length) {
        var cap = arr.length * 2
        while (cap < len + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    }
    def put(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    def putAll(bs: Array[Byte]): Unit = {
      ensure(bs.length)
      System.arraycopy(bs, 0, arr, len, bs.length)
      len += bs.length
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** Avro long: zigzag then base-128 varint, little-endian groups. */
  def writeLong(b: Buf, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63)
    while ((v & ~0x7fL) != 0L) {
      b.put(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    b.put(v.toByte)
  }

  def writeBytes(b: Buf, bytes: Array[Byte]): Unit = {
    writeLong(b, bytes.length.toLong)
    b.putAll(bytes)
  }

  def writeString(b: Buf, s: UTF8String): Unit = writeBytes(b, s.getBytes)

  private def writeNullableStr(b: Buf, row: InternalRow, i: Int): Unit =
    if (row.isNullAt(i)) writeLong(b, 0L)
    else { writeLong(b, 1L); writeString(b, row.getUTF8String(i)) }

  // ----- decode (O22: consumer side of the Confluent topic) -----------

  /** Streaming cursor over an Avro-binary buffer. */
  final class Cursor(val buf: Array[Byte]) { var pos: Int = 0 }

  def readLong(c: Cursor): Long = {
    var v = 0L; var shift = 0
    var b = c.buf(c.pos); c.pos += 1
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift; shift += 7
      b = c.buf(c.pos); c.pos += 1
    }
    v |= (b & 0x7fL) << shift
    (v >>> 1) ^ -(v & 1L) // un-zigzag
  }

  def readString(c: Cursor): UTF8String = {
    val n = readLong(c).toInt
    val s = UTF8String.fromBytes(c.buf, c.pos, n)
    c.pos += n
    s
  }

  /** Decode Avro-binary logLine bytes back to an InternalRow shaped as
    * [[inputSchema]] — the inverse of [[encodeStruct]], used by the
    * avro_logline_decode expression (reference consumer path,
    * V:elodina/go-kafka-avro/avro_encoder_decoder.go:127-170).
    */
  def decodeStruct(bytes: Array[Byte]): InternalRow = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    val c = new Cursor(bytes)
    val out = new Array[Any](5)
    out(0) = if (readLong(c) == 0L) null else readString(c)
    out(1) = if (readLong(c) == 0L) null else readString(c)
    out(2) = if (readLong(c) == 0L) null
    else {
      val ks = scala.collection.mutable.ArrayBuffer.empty[Any]
      val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = readLong(c)
      while (n != 0L) {
        if (n < 0) { readLong(c); n = -n } // block-size form
        var i = 0L
        while (i < n) { ks += readString(c); vs += readString(c); i += 1 }
        n = readLong(c)
      }
      new ArrayBasedMapData(new GenericArrayData(ks.toArray),
        new GenericArrayData(vs.toArray))
    }
    out(3) = if (readLong(c) == 0L) null else readLong(c)
    out(4) = if (readLong(c) == 0L) null
    else {
      val items = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = readLong(c)
      while (n != 0L) {
        if (n < 0) { readLong(c); n = -n }
        var i = 0L
        while (i < n) {
          items += new GenericInternalRow(
            Array[Any](readString(c), readLong(c)))
          i += 1
        }
        n = readLong(c)
      }
      new GenericArrayData(items.toArray)
    }
    new GenericInternalRow(out)
  }

  /** Encode one logLine from an InternalRow shaped as [[inputSchema]].
    * Called from both interpreted eval and generated code.
    */
  def encodeStruct(row: InternalRow): Array[Byte] = {
    val b = new Buf(128)
    writeNullableStr(b, row, 0) // line
    writeNullableStr(b, row, 1) // source
    if (row.isNullAt(2)) writeLong(b, 0L) // tag
    else {
      writeLong(b, 1L)
      val m: MapData = row.getMap(2)
      val n = m.numElements()
      if (n > 0) {
        writeLong(b, n.toLong)
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < n) {
          writeString(b, ks.getUTF8String(i))
          writeString(b, vs.getUTF8String(i))
          i += 1
        }
      }
      writeLong(b, 0L) // block terminator (empty map = just this)
    }
    if (row.isNullAt(3)) writeLong(b, 0L) // logtypeid
    else { writeLong(b, 1L); writeLong(b, row.getLong(3)) }
    if (row.isNullAt(4)) writeLong(b, 0L) // timings
    else {
      writeLong(b, 1L)
      val a: ArrayData = row.getArray(4)
      val n = a.numElements()
      if (n > 0) {
        writeLong(b, n.toLong)
        var i = 0
        while (i < n) {
          val t = a.getStruct(i, 2)
          writeString(b, t.getUTF8String(0))
          writeLong(b, t.getLong(1))
          i += 1
        }
      }
      writeLong(b, 0L)
    }
    b.result()
  }
}
