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
  *  - bounded String / FixedString(N) / UUID:
  *    RowBinaryClickHousePrimitiveTypeWriter.scala:40-69 — see [[FieldSpec]]
  *    for the per-field directive grammar (`graft_rowbinary(struct, spec)`).
  *    FixedString pads with 0x00; UUID is msb+lsb, each little-endian.
  *
  * Usage: `graft_rowbinary(struct(cols...))` → binary. At 100 TB this runs
  * embarrassingly parallel in the projection before a sink write.
  * Participates in whole-stage codegen: `doGenCode` emits straight-line
  * per-field writes specialized at compile time (the type dispatch the
  * interpreted path does per row happens once, at codegen), mirroring the
  * reference's macro-derived compile-time encoders. */
case class RowBinaryEncode(child: Expression, spec: String = "") extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private lazy val fields: Array[StructField] = child.dataType match {
    case s: StructType => s.fields
    case _ => Array.empty
  }

  private lazy val directives: Array[FieldDirective] = child.dataType match {
    case s: StructType => FieldSpec.resolve(s, FieldSpec.parse(spec))
    case _ => Array.empty
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      val bad = s.fields.filterNot(f => RowBinaryEncode.supported(f.dataType))
      if (bad.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"graft_rowbinary: unsupported field types ${bad.map(_.dataType).mkString(", ")}")
      else {
        val parsed = try Right(FieldSpec.parse(spec)) catch {
          case e: IllegalArgumentException => Left(e.getMessage)
        }
        parsed.fold(TypeCheckResult.TypeCheckFailure.apply,
          ds => FieldSpec.check(s, ds)
            .map(m => TypeCheckResult.TypeCheckFailure(s"graft_rowbinary: $m"))
            .getOrElse(TypeCheckResult.TypeCheckSuccess))
      }
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
        else { out.write(0); RowBinaryEncode.writeValue(out, f.dataType, row, i, directives(i)) }
      } else {
        // Spark nullability is advisory (joins/UDFs can mis-propagate it);
        // a non-nullable wire column has NO null-flag byte, so a runtime
        // null here must fail loudly — silently encoding 0/empty bytes
        // (UnsafeRow) or NPEing (GenericInternalRow) corrupts the stream
        if (row.isNullAt(i)) throw RowBinaryEncode.nullInNonNullable(f.name)
        RowBinaryEncode.writeValue(out, f.dataType, row, i, directives(i))
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
        val w = RowBinaryEncode.genWrite(f.dataType, buf, row, i, directives(i))
        if (f.nullable)
          s"if ($row.isNullAt($i)) { $buf.write(1); } else { $buf.write(0); $w }"
        else
          s"""if ($row.isNullAt($i)) throw graft.functions.RowBinaryEncode.nullInNonNullable("${f.name}");
             |$w""".stripMargin
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
  import FieldDirective._

  /** Static so generated Java raises the identical error. */
  def nullInNonNullable(field: String): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_rowbinary: null value in non-nullable field '$field' — " +
        "declare the field nullable or fix the upstream nullability")

  def supported(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
        BooleanType | StringType | BinaryType | TimestampType | DateType => true
    case _ => false
  }

  /** Unsigned LEB128 varint (kept here for spec/property tests). */
  def writeLeb128(out: ByteArrayOutputStream, value: Long): Unit =
    BinaryRowWriters.writeLeb128(out, value)

  def writeValue(out: ByteArrayOutputStream, t: DataType, row: InternalRow, i: Int): Unit =
    writeValue(out, t, row, i, Default)

  def writeValue(out: ByteArrayOutputStream, t: DataType, row: InternalRow, i: Int,
      d: FieldDirective): Unit = (t, d) match {
    case (StringType, Bounded(n, tr)) =>
      BinaryRowWriters.writeBoundedLeb(out, row.getUTF8String(i).getBytes, n, tr, charBoundary = true)
    case (BinaryType, Bounded(n, tr)) =>
      BinaryRowWriters.writeBoundedLeb(out, row.getBinary(i), n, tr, charBoundary = false)
    case (StringType, Fixed(n, tr)) => // FixedString(N): no prefix, 0x00 pad
      BinaryRowWriters.writeFixedPadded(out, row.getUTF8String(i).getBytes, n, tr, 0, charBoundary = true)
    case (BinaryType, Fixed(n, tr)) =>
      BinaryRowWriters.writeFixedPadded(out, row.getBinary(i), n, tr, 0, charBoundary = false)
    case (StringType, Uuid) =>
      BinaryRowWriters.writeUuid(out, row.getUTF8String(i).toString, littleEndian = true)
    case (LongType, _) => BinaryRowWriters.writeLE(out, row.getLong(i), 8)
    case (IntegerType, _) => BinaryRowWriters.writeLE(out, row.getInt(i).toLong, 4)
    case (ShortType, _) => BinaryRowWriters.writeLE(out, row.getShort(i).toLong, 2)
    case (ByteType, _) => out.write(row.getByte(i).toInt)
    case (DoubleType, _) => BinaryRowWriters.writeLE(out, java.lang.Double.doubleToLongBits(row.getDouble(i)), 8)
    case (FloatType, _) => BinaryRowWriters.writeLE(out, java.lang.Float.floatToIntBits(row.getFloat(i)).toLong, 4)
    case (BooleanType, _) => out.write(if (row.getBoolean(i)) 1 else 0)
    case (StringType, _) => BinaryRowWriters.writeBytesLeb(out, row.getUTF8String(i).getBytes)
    case (BinaryType, _) => BinaryRowWriters.writeBytesLeb(out, row.getBinary(i))
    case (TimestampType, _) =>
      // DateTime: uint32 epoch seconds (micros floor-divided, range-checked)
      BinaryRowWriters.writeLE(out, BinaryRowWriters.toDateTimeSeconds(row.getLong(i)), 4)
    case (DateType, _) =>
      // Date: uint16 days since epoch (range-checked)
      BinaryRowWriters.writeLE(out, BinaryRowWriters.toDateDays(row.getInt(i)), 2)
    case (other, _) => throw new UnsupportedOperationException(s"graft_rowbinary: $other")
  }

  /** Java statement writing field `i` of `row` to `buf` — the codegen
    * twin of [[writeValue]], specialized per type AND directive at
    * compile time. */
  private[functions] def genWrite(t: DataType, buf: String, row: String, i: Int,
      d: FieldDirective): String = {
    val W = "graft.functions.BinaryRowWriters"
    (t, d) match {
      case (StringType, Bounded(n, tr)) =>
        s"$W.writeBoundedLeb($buf, $row.getUTF8String($i).getBytes(), $n, $tr, true);"
      case (BinaryType, Bounded(n, tr)) =>
        s"$W.writeBoundedLeb($buf, $row.getBinary($i), $n, $tr, false);"
      case (StringType, Fixed(n, tr)) =>
        s"$W.writeFixedPadded($buf, $row.getUTF8String($i).getBytes(), $n, $tr, 0, true);"
      case (BinaryType, Fixed(n, tr)) =>
        s"$W.writeFixedPadded($buf, $row.getBinary($i), $n, $tr, 0, false);"
      case (StringType, Uuid) =>
        s"$W.writeUuid($buf, $row.getUTF8String($i).toString(), true);"
      case (LongType, _) => s"$W.writeLE($buf, $row.getLong($i), 8);"
      case (IntegerType, _) => s"$W.writeLE($buf, (long) $row.getInt($i), 4);"
      case (ShortType, _) => s"$W.writeLE($buf, (long) $row.getShort($i), 2);"
      case (ByteType, _) => s"$buf.write((int) $row.getByte($i));"
      case (DoubleType, _) => s"$W.writeLE($buf, java.lang.Double.doubleToLongBits($row.getDouble($i)), 8);"
      case (FloatType, _) => s"$W.writeLE($buf, (long) java.lang.Float.floatToIntBits($row.getFloat($i)), 4);"
      case (BooleanType, _) => s"$buf.write($row.getBoolean($i) ? 1 : 0);"
      case (StringType, _) => s"$W.writeBytesLeb($buf, $row.getUTF8String($i).getBytes());"
      case (BinaryType, _) => s"$W.writeBytesLeb($buf, $row.getBinary($i));"
      case (TimestampType, _) => s"$W.writeLE($buf, $W.toDateTimeSeconds($row.getLong($i)), 4);"
      case (DateType, _) => s"$W.writeLE($buf, $W.toDateDays($row.getInt($i)), 2);"
      case (other, _) => throw new UnsupportedOperationException(s"graft_rowbinary: $other")
    }
  }
}
