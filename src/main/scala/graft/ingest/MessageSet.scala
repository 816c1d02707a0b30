package graft.ingest

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, GZIPInputStream, GZIPOutputStream}

/** Kafka v0 message-set codec — the consumer-side decode path of the
  * reference's wire client, including compressed (recursive) sets:
  * /root/reference/.../elodina/siesta/messages.go:43-93 (MessageAndOffset
  * + ReadMessageSet), :107-177 (Message.Read with gzip/snappy nesting),
  * snappy.go:12-33 (xerial stream framing). The reference never WRITES
  * compressed sets (messages.go:179-187 is a TODO), so the encoder here
  * exists to build test vectors; decode is the production surface (a
  * replay/backfill job reading raw v0 fetch payloads).
  *
  * Wire layout per entry: offset int64 BE | size int32 BE | message,
  * where message = crc int32 | magic int8 | attributes int8 |
  * key bytes32 | value bytes32 (bytes32 = int32 BE length, -1 = null,
  * then bytes). attributes & 3 selects the codec: 0 none, 1 gzip,
  * 2 snappy (xerial stream framing `82 53 4E 41 50 50 59 00` + 8-byte
  * version/compat header + [int32 BE chunk size | raw snappy chunk]*,
  * or a bare raw block — both accepted, like the reference); a
  * compressed value is itself a message set, decoded recursively.
  * Faithful quirks: CRC is read but NOT verified (messages.go:108-112
  * stores it without checking), and a truncated trailing entry is
  * silently dropped, not an error (ReadMessageSet:79-92 treats EOF as
  * end-of-set — Kafka fetch responses cut message sets at byte
  * boundaries).
  */
object MessageSet {

  /** One decoded message: (offset, key, value) — key/value may be null. */
  final case class Entry(offset: Long, key: Array[Byte], value: Array[Byte])

  /** Corrupt (non-truncated) entry — a declared length that contradicts
    * the entry's own bounds. The truncation path stays silent (fetch
    * boundary semantics) but corruption must be a typed error like the
    * reference's DecodingError (messages.go:119-170 returns it for every
    * short read inside a sized entry), not an ArrayIndexOutOfBounds from
    * whatever copy happens to run off the buffer.
    */
  final class MessageSetCorruptException(msg: String)
    extends RuntimeException(msg)

  private val SnappyMagic: Array[Byte] =
    Array(130.toByte, 83, 78, 65, 80, 80, 89, 0)

  // --- decode ---------------------------------------------------------

  /** Decode a (possibly compressed, possibly truncated) v0 message set
    * into its flattened entries, inner-set messages carrying their own
    * stored offsets — exactly the reference's recursive Read.
    */
  def decode(bytes: Array[Byte]): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var pos = 0
    def remaining = bytes.length - pos
    def i32: Int = {
      val v = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4; v
    }
    def i64: Long = { val hi = i32.toLong; val lo = i32 & 0xffffffffL; (hi << 32) | lo }
    // field reads inside an entry are bounded by the entry's declared
    // size: a garbage key/value length in a corrupt (non-truncated)
    // entry must be a typed decode error, not an AIOOBE
    def bytes32(limit: Int): Array[Byte] = {
      if (limit - pos < 4)
        throw new MessageSetCorruptException(
          s"no room for length prefix (${limit - pos} bytes left in entry)")
      val n = i32
      if (n < 0) null
      else if (n > limit - pos)
        throw new MessageSetCorruptException(
          s"declared field length $n exceeds entry bounds (${limit - pos} bytes left)")
      else { val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a }
    }
    // minimum v0 message: crc 4 + magic 1 + attributes 1 + two bytes32
    // length prefixes 4+4
    val minMessage = 14
    while (remaining > 0) {
      // a truncated trailing entry ends the set silently (fetch-boundary
      // semantics); probe sizes before committing to reads
      if (remaining < 12) { pos = bytes.length }
      else {
        val offset = i64
        val size = i32
        if (size < 0 || size > remaining) { pos = bytes.length }
        else if (size < minMessage)
          // NOT truncation: the full entry is present but can't hold a
          // message — reading on would consume the next entry's bytes
          throw new MessageSetCorruptException(
            s"entry size $size below the $minMessage-byte message minimum")
        else {
          val end = pos + size
          i32 // crc: stored unverified by the reference; skipped here
          pos += 1 // magic
          val attributes = bytes(pos); pos += 1
          val key = bytes32(end)
          val value = bytes32(end)
          pos = end // defensive: never trust inner layout past `size`
          (attributes & 3) match {
            case 0 => out += Entry(offset, key, value)
            case 1 =>
              require(value != null, "gzip message with null value")
              out ++= decode(gunzip(value))
            case 2 =>
              require(value != null, "snappy message with null value")
              out ++= decode(unsnappy(value))
            case 3 => throw new UnsupportedOperationException(
              "LZ4 not implemented (matches reference messages.go:173)")
          }
        }
      }
    }
    out.result()
  }

  private def gunzip(v: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(v))
    try in.readAllBytes() finally in.close()
  }

  /** Xerial stream framing if the magic matches, else one raw block —
    * the same two-path accept as the reference's snappyDecode.
    */
  private def unsnappy(v: Array[Byte]): Array[Byte] =
    if (v.length >= 16 &&
        java.util.Arrays.equals(v, 0, 8, SnappyMagic, 0, 8)) {
      val out = new ByteArrayOutputStream(v.length)
      var cur = 16 // 8 magic + 8 version/compat
      while (cur < v.length) {
        val size = ((v(cur) & 0xff) << 24) | ((v(cur + 1) & 0xff) << 16) |
          ((v(cur + 2) & 0xff) << 8) | (v(cur + 3) & 0xff)
        cur += 4
        out.write(org.xerial.snappy.Snappy.uncompress(
          java.util.Arrays.copyOfRange(v, cur, cur + size)))
        cur += size
      }
      out.toByteArray
    } else org.xerial.snappy.Snappy.uncompress(v)

  // --- encode (test-vector builder; reference write path is plain-only) -

  private def putI32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v >>> 24); o.write(v >>> 16); o.write(v >>> 8); o.write(v)
  }
  private def putI64(o: ByteArrayOutputStream, v: Long): Unit = {
    putI32(o, (v >>> 32).toInt); putI32(o, v.toInt)
  }
  private def putBytes32(o: ByteArrayOutputStream, b: Array[Byte]): Unit =
    if (b == null) putI32(o, -1) else { putI32(o, b.length); o.write(b) }

  /** One wire message (crc | magic | attrs | key | value) with a REAL
    * CRC32 over magic..value, like Kafka brokers produce.
    */
  private def message(attrs: Byte, key: Array[Byte], value: Array[Byte]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(0) // magic v0
    body.write(attrs)
    putBytes32(body, key)
    putBytes32(body, value)
    val b = body.toByteArray
    val crc = new CRC32(); crc.update(b)
    val o = new ByteArrayOutputStream()
    putI32(o, crc.getValue.toInt); o.write(b)
    o.toByteArray
  }

  /** Encode entries as an uncompressed v0 message set. */
  def encodePlain(entries: Seq[Entry]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    entries.foreach { e =>
      val m = message(0, e.key, e.value)
      putI64(o, e.offset); putI32(o, m.length); o.write(m)
    }
    o.toByteArray
  }

  /** Wrap entries in a single gzip-compressed wrapper message. */
  def encodeGzip(entries: Seq[Entry], wrapperOffset: Long): Array[Byte] = {
    val inner = encodePlain(entries)
    val gz = new ByteArrayOutputStream()
    val z = new GZIPOutputStream(gz); z.write(inner); z.close()
    val o = new ByteArrayOutputStream()
    val m = message(1, null, gz.toByteArray)
    putI64(o, wrapperOffset); putI32(o, m.length); o.write(m)
    o.toByteArray
  }

  /** Wrap entries in a single snappy wrapper (xerial stream framing). */
  def encodeSnappy(entries: Seq[Entry], wrapperOffset: Long): Array[Byte] = {
    val inner = encodePlain(entries)
    val framed = new ByteArrayOutputStream()
    framed.write(SnappyMagic)
    putI32(framed, 1); putI32(framed, 1) // version, compat — like xerial
    val block = org.xerial.snappy.Snappy.compress(inner)
    putI32(framed, block.length); framed.write(block)
    val o = new ByteArrayOutputStream()
    val m = message(2, null, framed.toByteArray)
    putI64(o, wrapperOffset); putI32(o, m.length); o.write(m)
    o.toByteArray
  }
}
