package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Vertica-native-file row encoding as a Catalyst expression: per record,
  * int32 row size, MSB-first null bitmap (one bit per column), then the
  * non-null values — int64/float64 little-endian (Vertica integers and
  * floats are 8 bytes), int32-length-prefixed varchars, timestamps as
  * microseconds since 2000-01-01, dates as days since 2000-01-01.
  *
  * Semantics follow the reference writers (no code reuse):
  *  - record framing + null bitmap: vertica/file/native/NativeVerticaRecordStreamWriter.scala:36
  *  - primitive encodings: vertica/file/native/NativeVerticaPrimitiveTypeWriter.scala:22
  *
  * `VerticaNativeEncode.fileHeader` supplies the file-level magic/header so
  * a foreachBatch sink can assemble complete native files per partition.
  * Participates in whole-stage codegen: per-field writes are specialized
  * at compile time (see RowBinaryEncode for the rationale).
  */
case class VerticaNativeEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private lazy val fields: Array[StructField] = child.dataType match {
    case s: StructType => s.fields
    case _ => Array.empty
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      val bad = s.fields.filterNot(f => VerticaNativeEncode.supported(f.dataType))
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_verticarow: unsupported field types ${bad.map(_.dataType).mkString(", ")}")
    case t => TypeCheckResult.TypeCheckFailure(s"graft_verticarow expects struct, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val body = new ByteArrayOutputStream(64)
    val nullBits = new Array[Byte]((fields.length + 7) / 8)
    var i = 0
    while (i < fields.length) {
      if (row.isNullAt(i)) {
        nullBits(i / 8) = (nullBits(i / 8) | (1 << (8 - (i % 8) - 1))).toByte
      } else {
        VerticaNativeEncode.writeValue(body, fields(i).dataType, row, i)
      }
      i += 1
    }
    val out = new ByteArrayOutputStream(body.size() + nullBits.length + 4)
    VerticaNativeEncode.writeLE(out, body.size().toLong, 4)
    out.write(nullBits, 0, nullBits.length)
    body.writeTo(out)
    out.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val body = ctx.addMutableState("java.io.ByteArrayOutputStream", "verticaBodyBuf",
      v => s"$v = new java.io.ByteArrayOutputStream(64);")
    val out = ctx.addMutableState("java.io.ByteArrayOutputStream", "verticaOutBuf",
      v => s"$v = new java.io.ByteArrayOutputStream(80);")
    val nBitBytes = (fields.length + 7) / 8
    nullSafeCodeGen(ctx, ev, row => {
      val bits = ctx.freshName("nullBits")
      // isNullAt is checked for EVERY field (like the interpreted path):
      // Spark nullability is advisory, and a null in a nullable=false slot
      // must still set the bitmap bit rather than encode garbage
      val writes = fields.zipWithIndex.map { case (f, i) =>
        val w = VerticaNativeEncode.genWrite(f.dataType, body, row, i)
        s"""if ($row.isNullAt($i)) { $bits[${i / 8}] |= (byte) ${1 << (8 - (i % 8) - 1)}; }
           |else { $w }""".stripMargin
      }.mkString("\n")
      s"""
         |$body.reset();
         |byte[] $bits = new byte[$nBitBytes];
         |$writes
         |$out.reset();
         |graft.functions.BinaryRowWriters.writeLE($out, (long) $body.size(), 4);
         |$out.write($bits, 0, $nBitBytes);
         |graft.functions.BinaryRowWriters.transfer($body, $out);
         |${ev.value} = $out.toByteArray();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): VerticaNativeEncode = copy(child = c)

  override def prettyName: String = "graft_verticarow"
}

object VerticaNativeEncode {

  /** Microseconds between 1970-01-01 and 2000-01-01 (Vertica's epoch). */
  final val VerticaEpochMicros = 946684800000000L
  final val VerticaEpochDays = 10957L

  def supported(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
        BooleanType | StringType | BinaryType | TimestampType | DateType => true
    case _ => false
  }

  private[functions] def writeLE(out: ByteArrayOutputStream, v: Long, nBytes: Int): Unit = {
    var i = 0
    while (i < nBytes) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Static size per column: -1 for variable-width (varchar/varbinary). */
  def staticSize(t: DataType): Int = t match {
    case StringType | BinaryType => -1
    case BooleanType => 1
    case _ => 8
  }

  /** File-level header: magic bytes, header area size, version, filler,
    * column count, per-column static sizes. */
  def fileHeader(schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    Seq(0x4e, 0x41, 0x54, 0x49, 0x56, 0x45, 0x0a, 0xff, 0x0d, 0x0a, 0x00).foreach(out.write)
    writeLE(out, (2 + 1 + 2 + 4 * schema.length).toLong, 4)
    out.write(0x01); out.write(0x00) // version
    out.write(0x00) // filler
    writeLE(out, schema.length.toLong, 2)
    schema.fields.foreach(f => writeLE(out, staticSize(f.dataType).toLong, 4))
    out.toByteArray
  }

  def writeValue(out: ByteArrayOutputStream, t: DataType, row: InternalRow, i: Int): Unit = t match {
    case LongType => writeLE(out, row.getLong(i), 8)
    case IntegerType => writeLE(out, row.getInt(i).toLong, 8) // Vertica INTEGER = 8 bytes
    case ShortType => writeLE(out, row.getShort(i).toLong, 8)
    case ByteType => writeLE(out, row.getByte(i).toLong, 8)
    case DoubleType => writeLE(out, java.lang.Double.doubleToLongBits(row.getDouble(i)), 8)
    case FloatType => // Vertica FLOAT = 8-byte double
      writeLE(out, java.lang.Double.doubleToLongBits(row.getFloat(i).toDouble), 8)
    case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
    case StringType => BinaryRowWriters.writeBytesI32(out, row.getUTF8String(i).getBytes)
    case BinaryType => BinaryRowWriters.writeBytesI32(out, row.getBinary(i))
    case TimestampType =>
      writeLE(out, row.getLong(i) - VerticaEpochMicros, 8)
    case DateType =>
      writeLE(out, row.getInt(i).toLong - VerticaEpochDays, 8)
    case other => throw new UnsupportedOperationException(s"graft_verticarow: $other")
  }

  /** Codegen twin of [[writeValue]] — Java statement per field. */
  private[functions] def genWrite(t: DataType, buf: String, row: String, i: Int): String = {
    val W = "graft.functions.BinaryRowWriters"
    t match {
      case LongType => s"$W.writeLE($buf, $row.getLong($i), 8);"
      case IntegerType => s"$W.writeLE($buf, (long) $row.getInt($i), 8);"
      case ShortType => s"$W.writeLE($buf, (long) $row.getShort($i), 8);"
      case ByteType => s"$W.writeLE($buf, (long) $row.getByte($i), 8);"
      case DoubleType => s"$W.writeLE($buf, java.lang.Double.doubleToLongBits($row.getDouble($i)), 8);"
      case FloatType => s"$W.writeLE($buf, java.lang.Double.doubleToLongBits((double) $row.getFloat($i)), 8);"
      case BooleanType => s"$buf.write($row.getBoolean($i) ? 1 : 0);"
      case StringType => s"$W.writeBytesI32($buf, $row.getUTF8String($i).getBytes());"
      case BinaryType => s"$W.writeBytesI32($buf, $row.getBinary($i));"
      case TimestampType => s"$W.writeLE($buf, $row.getLong($i) - ${VerticaEpochMicros}L, 8);"
      case DateType => s"$W.writeLE($buf, (long) $row.getInt($i) - ${VerticaEpochDays}L, 8);"
      case other => throw new UnsupportedOperationException(s"graft_verticarow: $other")
    }
  }
}
