package graft.functions

import java.io.ByteArrayOutputStream

/** Byte-level write helpers shared by the interpreted AND generated code
  * of the binary row encoders. A standalone object (no companion class)
  * compiles with static forwarders, so Janino-generated Java can call
  * `graft.functions.BinaryRowWriters.writeLE(...)` directly. */
object BinaryRowWriters {

  def writeLE(out: ByteArrayOutputStream, v: Long, nBytes: Int): Unit = {
    var i = 0
    while (i < nBytes) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** ClickHouse DateTime is UNSIGNED int32 epoch seconds; a value
    * outside [0, 2^32-1] would silently wrap through the 4-byte truncate
    * (1969-12-31 23:59:59 reads back as year 2106). Range-check loudly —
    * the readers treat corruption as an error, the writers must too. */
  def toDateTimeSeconds(micros: Long): Long = {
    val s = Math.floorDiv(micros, 1000000L)
    if (s < 0L || s > 0xFFFFFFFFL) throw new IllegalArgumentException(
      s"timestamp out of DateTime range: epoch seconds $s not in [0, 4294967295]")
    s
  }

  /** ClickHouse Date is UNSIGNED uint16 days since epoch — same wrap
    * hazard as [[toDateTimeSeconds]] (day 65744 would read back as day
    * 208). */
  def toDateDays(days: Int): Long = {
    if (days < 0 || days > 0xFFFF) throw new IllegalArgumentException(
      s"date out of Date range: days-since-epoch $days not in [0, 65535]")
    days.toLong
  }

  /** Unsigned LEB128 varint. */
  def writeLeb128(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    var continue = true
    while (continue) {
      val b = (v & 0x7f).toInt
      v = v >>> 7
      if (v != 0) out.write(b | 0x80) else { out.write(b); continue = false }
    }
  }

  /** LEB128 length prefix + raw bytes (RowBinary strings/blobs). */
  def writeBytesLeb(out: ByteArrayOutputStream, bytes: Array[Byte]): Unit = {
    writeLeb128(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  /** int32-LE length prefix + raw bytes (Vertica varchar/varbinary). */
  def writeBytesI32(out: ByteArrayOutputStream, bytes: Array[Byte]): Unit = {
    writeLE(out, bytes.length.toLong, 4)
    out.write(bytes, 0, bytes.length)
  }

  /** `body.writeTo(out)` without the checked IOException (it cannot occur
    * on in-memory streams; generated code cannot declare throws). */
  def transfer(body: ByteArrayOutputStream, out: ByteArrayOutputStream): Unit =
    try body.writeTo(out)
    catch { case e: java.io.IOException => throw new RuntimeException(e) }

  /** Longest prefix of UTF-8 `bytes` that fits `maxBytes` WITHOUT
    * splitting a multi-byte character (semantics of the reference's
    * ByteWriter.stringToBytes, sink/encoding/binary/ByteWriter.scala:87):
    * if the byte after the cut is a continuation byte (10xxxxxx), back up
    * to the start of its sequence. */
  def utf8SafeLen(bytes: Array[Byte], maxBytes: Int): Int =
    if (bytes.length <= maxBytes) bytes.length
    else {
      var idx = maxBytes
      if ((bytes(idx) & 0xc0) == 0x80) { // inside a multi-byte char
        while (idx > 0 && (bytes(idx) & 0xc0) == 0x80) idx -= 1
        // invalid UTF-8 (continuation bytes all the way down): there is no
        // character boundary to respect — cut at the raw byte budget
        // rather than underflowing or dropping everything
        if (idx == 0 && (bytes(0) & 0xc0) == 0x80) idx = maxBytes
      }
      idx
    }

  /** Truncated length under `maxBytes`, or throw when the value does not
    * fit and truncation was not allowed (reference: writeByteArray /
    * writeString(maxBytes, truncate)). `charBoundary` selects UTF-8-safe
    * cutting (strings) vs raw byte cutting (binary). */
  def boundedLen(bytes: Array[Byte], maxBytes: Int, truncate: Boolean,
      charBoundary: Boolean): Int = {
    if (bytes.length > maxBytes && !truncate)
      throw new IllegalArgumentException(
        s"value occupies ${bytes.length} bytes and does not fit into $maxBytes bytes")
    if (charBoundary) utf8SafeLen(bytes, maxBytes) else math.min(bytes.length, maxBytes)
  }

  /** Bounded LEB128-prefixed bytes (ClickHouse String(max N)). */
  def writeBoundedLeb(out: ByteArrayOutputStream, bytes: Array[Byte], maxBytes: Int,
      truncate: Boolean, charBoundary: Boolean): Unit = {
    val n = boundedLen(bytes, maxBytes, truncate, charBoundary)
    writeLeb128(out, n.toLong)
    out.write(bytes, 0, n)
  }

  /** Bounded int32-LE-prefixed bytes (Vertica VARCHAR(N)/VARBINARY(N)). */
  def writeBoundedI32(out: ByteArrayOutputStream, bytes: Array[Byte], maxBytes: Int,
      truncate: Boolean, charBoundary: Boolean): Unit = {
    val n = boundedLen(bytes, maxBytes, truncate, charBoundary)
    writeLE(out, n.toLong, 4)
    out.write(bytes, 0, n)
  }

  /** Fixed-width value, right-padded with `pad` (ClickHouse FixedString
    * pads 0x00, Vertica CHAR pads spaces); no length prefix. */
  def writeFixedPadded(out: ByteArrayOutputStream, bytes: Array[Byte], length: Int,
      truncate: Boolean, pad: Int, charBoundary: Boolean): Unit = {
    val n = boundedLen(bytes, length, truncate, charBoundary)
    out.write(bytes, 0, n)
    var i = n
    while (i < length) { out.write(pad); i += 1 }
  }

  /** Canonical-string UUID as 16 bytes: msb then lsb, each little-endian
    * for ClickHouse RowBinary (RowBinaryClickHousePrimitiveTypeWriter
    * .scala:69) or big-endian for Vertica native
    * (NativeVerticaPrimitiveTypeWriter.scala:64). */
  def writeUuid(out: ByteArrayOutputStream, s: String, littleEndian: Boolean): Unit = {
    val u = java.util.UUID.fromString(s)
    // JDK fromString pads short hex groups ("1-2-3-4-5" parses), which
    // would silently mutate malformed ids on the round trip — require the
    // canonical 8-4-4-4-12 form (case-insensitive)
    if (!u.toString.equalsIgnoreCase(s))
      throw new IllegalArgumentException(
        s"uuid field: '$s' is not in canonical 8-4-4-4-12 form")
    if (littleEndian) {
      writeLE(out, u.getMostSignificantBits, 8)
      writeLE(out, u.getLeastSignificantBits, 8)
    } else {
      writeBE(out, u.getMostSignificantBits)
      writeBE(out, u.getLeastSignificantBits)
    }
  }

  private def writeBE(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 7
    while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
  }
}
