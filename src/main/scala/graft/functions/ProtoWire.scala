package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf *wire-format* codec as native Catalyst expressions — the
  * Spark-first analog of the reference's proto-described parquet writer
  * (`stream-loader-hadoop/.../parquet/ProtoParquetFileBuilder.scala:23`):
  * where the reference carries a compiled `Message` class end-to-end, graft
  * maps a STRUCT column to/from proto wire bytes so proto-encoded streams
  * can be decoded at ingest (RecordFormatter-style) and re-encoded at sinks
  * without any protobuf runtime on the cluster.
  *
  * The encoding implemented is the public protobuf wire format
  * (https://protobuf.dev/programming-guides/encoding/):
  *
  *  - field number = struct position + 1; tag varint `(num << 3) | wire`
  *  - long/int/short/byte/bool → wire 0 varint (two's-complement 64-bit,
  *    so negatives are 10 bytes — proto `int64`/`int32` semantics)
  *  - double → wire 1 fixed64 LE; float → wire 5 fixed32 LE
  *  - string (UTF-8) / binary → wire 2 length-delimited
  *  - timestamp → varint epoch MICROS; date → varint epoch days
  *  - array of long/int/double/float → wire 2 packed repeated
  *
  * Presence follows proto2/proto3-`optional` explicit-presence: a null
  * field is omitted from the bytes; a non-null default (0, "", empty
  * array) is still written. The decoder returns null for absent fields,
  * takes the LAST occurrence of a repeated scalar (proto spec), accepts
  * packed AND unpacked repeated numerics, and skips unknown field numbers
  * (forward compatibility) — all per the published spec.
  */
object ProtoWire {

  val WireVarint = 0; val WireFixed64 = 1; val WireLen = 2; val WireFixed32 = 5

  def supported(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType |
        DoubleType | FloatType | StringType | BinaryType | TimestampType | DateType => true
    case ArrayType(LongType | IntegerType | DoubleType | FloatType, _) => true
    case _ => false
  }

  def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, num: Int, wire: Int): Unit =
    writeVarint(out, ((num.toLong) << 3) | wire)

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit = {
    var i = 0
    while (i < 4) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def writeLen(out: ByteArrayOutputStream, bytes: Array[Byte]): Unit = {
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  /** Encode one struct row; called from both interpreted eval and the
    * generated code (static forwarder). */
  def encodeRow(row: InternalRow, fields: Array[StructField]): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    var i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) {
        val num = i + 1
        fields(i).dataType match {
          case LongType => writeTag(out, num, WireVarint); writeVarint(out, row.getLong(i))
          case IntegerType => writeTag(out, num, WireVarint); writeVarint(out, row.getInt(i).toLong)
          case ShortType => writeTag(out, num, WireVarint); writeVarint(out, row.getShort(i).toLong)
          case ByteType => writeTag(out, num, WireVarint); writeVarint(out, row.getByte(i).toLong)
          case BooleanType => writeTag(out, num, WireVarint); writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case DoubleType =>
            writeTag(out, num, WireFixed64)
            writeFixed64(out, java.lang.Double.doubleToLongBits(row.getDouble(i)))
          case FloatType =>
            writeTag(out, num, WireFixed32)
            writeFixed32(out, java.lang.Float.floatToIntBits(row.getFloat(i)))
          case StringType => writeTag(out, num, WireLen); writeLen(out, row.getUTF8String(i).getBytes)
          case BinaryType => writeTag(out, num, WireLen); writeLen(out, row.getBinary(i))
          case TimestampType => writeTag(out, num, WireVarint); writeVarint(out, row.getLong(i))
          case DateType => writeTag(out, num, WireVarint); writeVarint(out, row.getInt(i).toLong)
          case ArrayType(et, _) =>
            val arr = row.getArray(i)
            // proto repeated fields have no null elements; writing the
            // InternalRow default (0) would silently corrupt the data
            var k = 0
            while (k < arr.numElements()) {
              if (arr.isNullAt(k)) throw new IllegalArgumentException(
                s"graft_proto: null element at index $k of repeated field '${fields(i).name}' — " +
                  "filter nulls out before encoding")
              k += 1
            }
            val packed = new ByteArrayOutputStream(arr.numElements() * 4 + 8)
            var j = 0
            et match {
              case LongType => while (j < arr.numElements()) { writeVarint(packed, arr.getLong(j)); j += 1 }
              case IntegerType => while (j < arr.numElements()) { writeVarint(packed, arr.getInt(j).toLong); j += 1 }
              case DoubleType => while (j < arr.numElements()) {
                writeFixed64(packed, java.lang.Double.doubleToLongBits(arr.getDouble(j))); j += 1 }
              case FloatType => while (j < arr.numElements()) {
                writeFixed32(packed, java.lang.Float.floatToIntBits(arr.getFloat(j))); j += 1 }
              case other => throw new UnsupportedOperationException(s"graft_proto: array<$other>")
            }
            writeTag(out, num, WireLen); writeLen(out, packed.toByteArray)
          case other => throw new UnsupportedOperationException(s"graft_proto: $other")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        if (pos >= bytes.length) throw corrupt("truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw corrupt("varint exceeds 64 bits")
    }
    def readFixed64(): Long = {
      if (pos + 8 > bytes.length) throw corrupt("truncated fixed64")
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readFixed32(): Int = {
      if (pos + 4 > bytes.length) throw corrupt("truncated fixed32")
      var v = 0; var i = 0
      while (i < 4) { v |= (bytes(pos + i) & 0xFF) << (8 * i); i += 1 }
      pos += 4; v
    }
    def readLen(): Array[Byte] = {
      val n = readVarint()
      if (n < 0 || pos + n > bytes.length) throw corrupt(s"bad length $n")
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt); pos += n.toInt; r
    }
    def skip(wire: Int): Unit = wire match {
      case WireVarint => readVarint()
      case WireFixed64 => pos += 8; if (pos > bytes.length) throw corrupt("truncated fixed64 skip")
      case WireLen => // advance only — a skipped field must not cost a copy
        val skipN = readVarint()
        if (skipN < 0 || pos + skipN > bytes.length) throw corrupt(s"bad length $skipN")
        pos += skipN.toInt
      case WireFixed32 => pos += 4; if (pos > bytes.length) throw corrupt("truncated fixed32 skip")
      case w => throw corrupt(s"unsupported wire type $w (groups are deprecated)")
    }
  }

  def corrupt(msg: String): IllegalArgumentException =
    new IllegalArgumentException(s"graft_proto_decode: corrupt message: $msg")

  /** Decode one message into a row shaped by `schema` (absent → null);
    * called from both interpreted eval and the generated code. */
  def decodeRow(bytes: Array[Byte], schema: StructType): InternalRow = {
    val n = schema.length
    val values = new Array[Any](n)
    // repeated numerics accumulate across occurrences (packed or not)
    val acc = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    val in = new Reader(bytes)
    while (in.hasMore) {
      val tag = in.readVarint()
      // compare as LONG before narrowing: a 61-bit wire field number
      // truncated by .toInt could alias onto a valid small index and
      // silently land a foreign payload in the wrong field
      val numL = tag >>> 3
      val wire = (tag & 7).toInt
      if (numL <= 0L) throw corrupt("field number 0")
      if (numL > n) in.skip(wire) // unknown field: forward compatibility
      else {
        val i = numL.toInt - 1
        schema(i).dataType match {
          case LongType | TimestampType => values(i) = expectVarint(in, wire, schema(i).name)
          case IntegerType | DateType => values(i) = expectVarint(in, wire, schema(i).name).toInt
          case ShortType => values(i) = expectVarint(in, wire, schema(i).name).toShort
          case ByteType => values(i) = expectVarint(in, wire, schema(i).name).toByte
          case BooleanType => values(i) = expectVarint(in, wire, schema(i).name) != 0L
          case DoubleType => wire match {
            case WireFixed64 => values(i) = java.lang.Double.longBitsToDouble(in.readFixed64())
            case w => throw corrupt(s"field ${schema(i).name}: expected fixed64, got wire $w")
          }
          case FloatType => wire match {
            case WireFixed32 => values(i) = java.lang.Float.intBitsToFloat(in.readFixed32())
            case w => throw corrupt(s"field ${schema(i).name}: expected fixed32, got wire $w")
          }
          case StringType => wire match {
            case WireLen => values(i) = UTF8String.fromBytes(in.readLen())
            case w => throw corrupt(s"field ${schema(i).name}: expected length-delimited, got wire $w")
          }
          case BinaryType => wire match {
            case WireLen => values(i) = in.readLen()
            case w => throw corrupt(s"field ${schema(i).name}: expected length-delimited, got wire $w")
          }
          case ArrayType(et, _) =>
            if (acc(i) == null) acc(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
            val buf = acc(i)
            wire match {
              case WireLen => // packed
                val sub = new Reader(in.readLen())
                et match {
                  case LongType => while (sub.hasMore) buf += sub.readVarint()
                  case IntegerType => while (sub.hasMore) buf += sub.readVarint().toInt
                  case DoubleType => while (sub.hasMore) buf += java.lang.Double.longBitsToDouble(sub.readFixed64())
                  case FloatType => while (sub.hasMore) buf += java.lang.Float.intBitsToFloat(sub.readFixed32())
                  case other => throw corrupt(s"array<$other> unsupported")
                }
              case WireVarint if et == LongType => buf += in.readVarint()
              case WireVarint if et == IntegerType => buf += in.readVarint().toInt
              case WireFixed64 if et == DoubleType => buf += java.lang.Double.longBitsToDouble(in.readFixed64())
              case WireFixed32 if et == FloatType => buf += java.lang.Float.intBitsToFloat(in.readFixed32())
              case w => throw corrupt(s"field ${schema(i).name}: wire $w incompatible with array element $et")
            }
          case other => throw corrupt(s"unsupported target type $other")
        }
      }
    }
    var i = 0
    while (i < n) {
      if (acc(i) != null) values(i) = new GenericArrayData(acc(i).toArray)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  private def expectVarint(in: Reader, wire: Int, field: String): Long = wire match {
    case WireVarint => in.readVarint()
    case w => throw corrupt(s"field $field: expected varint, got wire $w")
  }
}

/** `graft_proto(struct)` → binary protobuf message (field numbers by
  * struct position, 1-based). Codegen emits a single static call — the
  * per-row loop is monomorphic and stays inside whole-stage codegen. */
case class ProtoWireEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private lazy val fields: Array[StructField] = child.dataType match {
    case s: StructType => s.fields
    case _ => Array.empty
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      val bad = s.fields.filterNot(f => ProtoWire.supported(f.dataType))
      if (bad.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"graft_proto: unsupported field types ${bad.map(_.dataType).mkString(", ")}")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_proto expects struct, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ProtoWire.encodeRow(input.asInstanceOf[InternalRow], fields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fieldsRef = ctx.addReferenceObj("protoFields", fields,
      "org.apache.spark.sql.types.StructField[]")
    nullSafeCodeGen(ctx, ev, row =>
      s"${ev.value} = graft.functions.ProtoWire.encodeRow($row, $fieldsRef);")
  }

  override protected def withNewChildInternal(c: Expression): ProtoWireEncode = copy(child = c)

  override def prettyName: String = "graft_proto"
}

/** `graft_proto_decode(binary, 'a BIGINT, b STRING, …')` → struct. The DDL
  * literal names the target fields in field-number order (position+1);
  * every output field is nullable (absent ⇒ null). */
case class ProtoWireDecode(child: Expression, ddl: String) extends UnaryExpression {

  private lazy val parsed: Either[String, StructType] =
    try {
      val s = StructType.fromDDL(ddl)
      val bad = s.fields.filterNot(f => ProtoWire.supported(f.dataType))
      if (s.isEmpty) Left("graft_proto_decode: empty schema")
      else if (bad.nonEmpty)
        Left(s"graft_proto_decode: unsupported field types ${bad.map(_.dataType).mkString(", ")}")
      else Right(StructType(s.fields.map(_.copy(nullable = true))))
    } catch {
      case e: Exception => Left(s"graft_proto_decode: bad schema DDL '$ddl': ${e.getMessage}")
    }

  private lazy val schema: StructType = parsed.toOption.get

  override def dataType: DataType = parsed.getOrElse(new StructType())

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      parsed.fold(TypeCheckResult.TypeCheckFailure.apply, _ => TypeCheckResult.TypeCheckSuccess)
    case t => TypeCheckResult.TypeCheckFailure(s"graft_proto_decode expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ProtoWire.decodeRow(input.asInstanceOf[Array[Byte]], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("protoSchema", schema,
      "org.apache.spark.sql.types.StructType")
    nullSafeCodeGen(ctx, ev, bytes =>
      s"${ev.value} = graft.functions.ProtoWire.decodeRow($bytes, $schemaRef);")
  }

  override protected def withNewChildInternal(c: Expression): ProtoWireDecode = copy(child = c)

  override def prettyName: String = "graft_proto_decode"
}
