package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}

/** Little-endian byte-stream reader shared by the binary-format
  * connectors (RowBinary, Vertica native). One probe-aware EOF model:
  * callers probe the first byte of a record with [[readByteOrEof]] and
  * feed it back through the `first` parameters. */
private[sources] class ByteReader(raw: InputStream, val source: String) {

  private val in = new BufferedInputStream(raw, 1 << 16)

  def readByteOrEof(): Int = in.read()

  def readByte(): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException(s"truncated record in $source")
    b
  }

  def readLE(nBytes: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nBytes) { v |= (readByte().toLong & 0xff) << (8 * i); i += 1 }
    v
  }

  /** LE value whose first byte was already consumed as an EOF probe. */
  def readLEFirst(first: Int, nRest: Int): Long =
    (first.toLong & 0xff) | (readLE(nRest) << 8)

  /** Unsigned LEB128 whose first byte was already consumed. */
  def readLeb128First(first: Int): Long = {
    var b = first
    var v = 0L
    var shift = 0
    while (true) {
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
      b = readByte()
    }
    v // unreachable
  }

  def readBytes(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"truncated payload in $source")
      off += r
    }
    buf
  }

  def close(): Unit = in.close()
}
