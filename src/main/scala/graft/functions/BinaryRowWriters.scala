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
}
