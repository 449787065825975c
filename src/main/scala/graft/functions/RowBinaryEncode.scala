package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** ClickHouse-RowBinary-style row encoding as a Catalyst expression:
  * little-endian primitives, unsigned-LEB128-length-prefixed UTF-8
  * strings, DateTime as int32 epoch seconds, and a 0x01/0x00 null flag
  * prefix for nullable fields.
  *
  * Semantics follow the reference encoders (no code reuse):
  *  - little-endian primitives: sink/encoding/binary/LittleEndianByteWriter.scala:18
  *  - LEB128 + string/DateTime: clickhouse/rowbinary/RowBinaryClickHousePrimitiveTypeWriter.scala:27
  *
  * Usage: `graft_rowbinary(struct(cols...))` → binary. At 100 TB this runs
  * embarrassingly parallel in the projection before a sink write.
  * Participates in whole-stage codegen: `doGenCode` emits straight-line
  * per-field writes specialized at compile time (the type dispatch the
  * interpreted path does per row happens once, at codegen), mirroring the
  * reference's macro-derived compile-time encoders. */
case class RowBinaryEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private lazy val fields: Array[StructField] = child.dataType match {
    case s: StructType => s.fields
    case _ => Array.empty
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      val bad = s.fields.filterNot(f => RowBinaryEncode.supported(f.dataType))
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_rowbinary: unsupported field types ${bad.map(_.dataType).mkString(", ")}")
    case t => TypeCheckResult.TypeCheckFailure(s"graft_rowbinary expects struct, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val out = new ByteArrayOutputStream(64)
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      if (f.nullable) {
        if (row.isNullAt(i)) out.write(1)
        else { out.write(0); RowBinaryEncode.writeValue(out, f.dataType, row, i) }
      } else {
        RowBinaryEncode.writeValue(out, f.dataType, row, i)
      }
      i += 1
    }
    out.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("java.io.ByteArrayOutputStream", "rowBinaryBuf",
      v => s"$v = new java.io.ByteArrayOutputStream(64);")
    nullSafeCodeGen(ctx, ev, row => {
      val writes = fields.zipWithIndex.map { case (f, i) =>
        val w = RowBinaryEncode.genWrite(f.dataType, buf, row, i)
        if (f.nullable)
          s"if ($row.isNullAt($i)) { $buf.write(1); } else { $buf.write(0); $w }"
        else w
      }.mkString("\n")
      s"""
         |$buf.reset();
         |$writes
         |${ev.value} = $buf.toByteArray();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): RowBinaryEncode = copy(child = c)

  override def prettyName: String = "graft_rowbinary"
}

object RowBinaryEncode {

  def supported(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
        BooleanType | StringType | BinaryType | TimestampType | DateType => true
    case _ => false
  }

  /** Unsigned LEB128 varint (kept here for spec/property tests). */
  def writeLeb128(out: ByteArrayOutputStream, value: Long): Unit =
    BinaryRowWriters.writeLeb128(out, value)

  def writeValue(out: ByteArrayOutputStream, t: DataType, row: InternalRow, i: Int): Unit = t match {
    case LongType => BinaryRowWriters.writeLE(out, row.getLong(i), 8)
    case IntegerType => BinaryRowWriters.writeLE(out, row.getInt(i).toLong, 4)
    case ShortType => BinaryRowWriters.writeLE(out, row.getShort(i).toLong, 2)
    case ByteType => out.write(row.getByte(i).toInt)
    case DoubleType => BinaryRowWriters.writeLE(out, java.lang.Double.doubleToLongBits(row.getDouble(i)), 8)
    case FloatType => BinaryRowWriters.writeLE(out, java.lang.Float.floatToIntBits(row.getFloat(i)).toLong, 4)
    case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
    case StringType => BinaryRowWriters.writeBytesLeb(out, row.getUTF8String(i).getBytes)
    case BinaryType => BinaryRowWriters.writeBytesLeb(out, row.getBinary(i))
    case TimestampType =>
      // DateTime: int32 epoch seconds (micros floor-divided)
      BinaryRowWriters.writeLE(out, Math.floorDiv(row.getLong(i), 1000000L), 4)
    case DateType =>
      // Date: uint16 days since epoch
      BinaryRowWriters.writeLE(out, row.getInt(i).toLong, 2)
    case other => throw new UnsupportedOperationException(s"graft_rowbinary: $other")
  }

  /** Java statement writing field `i` of `row` to `buf` — the codegen
    * twin of [[writeValue]], specialized per type at compile time. */
  private[functions] def genWrite(t: DataType, buf: String, row: String, i: Int): String = {
    val W = "graft.functions.BinaryRowWriters"
    t match {
      case LongType => s"$W.writeLE($buf, $row.getLong($i), 8);"
      case IntegerType => s"$W.writeLE($buf, (long) $row.getInt($i), 4);"
      case ShortType => s"$W.writeLE($buf, (long) $row.getShort($i), 2);"
      case ByteType => s"$buf.write((int) $row.getByte($i));"
      case DoubleType => s"$W.writeLE($buf, java.lang.Double.doubleToLongBits($row.getDouble($i)), 8);"
      case FloatType => s"$W.writeLE($buf, (long) java.lang.Float.floatToIntBits($row.getFloat($i)), 4);"
      case BooleanType => s"$buf.write($row.getBoolean($i) ? 1 : 0);"
      case StringType => s"$W.writeBytesLeb($buf, $row.getUTF8String($i).getBytes());"
      case BinaryType => s"$W.writeBytesLeb($buf, $row.getBinary($i));"
      case TimestampType => s"$W.writeLE($buf, java.lang.Math.floorDiv($row.getLong($i), 1000000L), 4);"
      case DateType => s"$W.writeLE($buf, (long) $row.getInt($i), 2);"
      case other => throw new UnsupportedOperationException(s"graft_rowbinary: $other")
    }
  }
}
