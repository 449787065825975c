package graft.sources

import java.io.BufferedOutputStream
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{FieldDirective, FieldSpec, VerticaNativeEncode}

/** DataSource V2 connector for Vertica native binary files — the format
  * `graft_verticarow` frames (file header with magic + column widths,
  * then per row: int32 body size, MSB-first null bitmap over ALL
  * columns, little-endian 8-byte numerics, int32-length varchars,
  * 2000-epoch timestamps). The reference ships this INTO Vertica COPY;
  * this connector also reads it back. The null bitmap always covers
  * every column, so the wire format is nullability-independent — no
  * flag-presence ambiguity. Reads require an explicit schema; files are
  * unsplittable (one input partition per file). */
class VerticaNativeSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-vertica-native requires an explicit read schema via .schema(...)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new VerticaNativeTable(schema, properties.get("path"),
      ConnectorFiles.optionIgnoreCase(properties, "fieldspec").getOrElse(""))
}

private[sources] class VerticaNativeTable(tableSchema: StructType, path: String,
    fieldSpec: String)
    extends Table with SupportsRead with SupportsWrite {

  require(path != null, "graft-vertica-native requires a path")
  FieldSpec.check(tableSchema, FieldSpec.parse(fieldSpec))
    .foreach(m => throw new IllegalArgumentException(s"graft-vertica-native: $m"))

  override def name(): String = s"graft-vertica-native:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        ConnectorFiles.listDataFiles(path,
            ConnectorFiles.restoreConf(ConnectorFiles.captureConf()), ".vnative")
          .map(f => VerticaNativePartition(f.toString): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new VerticaNativeReaderFactory(tableSchema, fieldSpec, ConnectorFiles.captureConf())
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with Write with BatchWrite {
      override def build(): Write = this
      override def toBatch: BatchWrite = this
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new VerticaNativeWriterFactory(path, tableSchema, fieldSpec, ConnectorFiles.captureConf())
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        ConnectorFiles.deleteCommitted(
          messages.collect { case VerticaNativeCommit(f) => f },
          ConnectorFiles.restoreConf(ConnectorFiles.captureConf()))
    }
}

private[sources] case class VerticaNativePartition(file: String) extends InputPartition

private[sources] class VerticaNativeReaderFactory(schema: StructType, fieldSpec: String,
    confProps: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VerticaNativeReader(partition.asInstanceOf[VerticaNativePartition].file, schema,
      fieldSpec, ConnectorFiles.restoreConf(confProps))
}

/** Streaming decoder — the inverse of VerticaNativeEncode's framing. */
private[sources] class VerticaNativeReader(file: String, schema: StructType,
    fieldSpec: String, conf: Configuration) extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(file)
    new ByteReader(p.getFileSystem(conf).open(p), file)
  }
  private val fields = schema.fields
  private val directives = FieldSpec.resolve(schema, FieldSpec.parse(fieldSpec))
  private val nBitBytes = (fields.length + 7) / 8
  private var current: InternalRow = _

  // ---- validate the file header up front ----------------------------------
  locally {
    val magic = in.readBytes(11)
    val expect = Array(0x4e, 0x41, 0x54, 0x49, 0x56, 0x45, 0x0a, 0xff, 0x0d, 0x0a, 0x00)
      .map(_.toByte)
    if (!java.util.Arrays.equals(magic, expect))
      throw new java.io.IOException(s"not a Vertica native file: $file")
    val headerArea = in.readLE(4).toInt
    if (headerArea < 5)
      throw new java.io.IOException(s"truncated Vertica native header in $file")
    val header = in.readBytes(headerArea) // version, filler, column count + widths
    val nCols = (header(3) & 0xff) | ((header(4) & 0xff) << 8)
    if (nCols != fields.length)
      throw new java.io.IOException(
        s"$file has $nCols columns, read schema has ${fields.length}")
    if (headerArea < 5 + 4 * nCols)
      throw new java.io.IOException(s"truncated Vertica native column widths in $file")
    // per-column widths must agree with the read schema's types — a
    // count-compatible but type-mismatched schema would misalign parses
    var i = 0
    while (i < nCols) {
      val off = 5 + 4 * i
      val w = (header(off) & 0xff) | ((header(off + 1) & 0xff) << 8) |
        ((header(off + 2) & 0xff) << 16) | ((header(off + 3) & 0xff) << 24)
      val expect = VerticaNativeEncode.staticSize(fields(i).dataType, directives(i))
      if (w != expect)
        throw new java.io.IOException(
          s"$file column ${fields(i).name}: stored width $w, schema type " +
            s"${fields(i).dataType.simpleString} expects $expect")
      i += 1
    }
  }

  override def next(): Boolean = {
    val first = in.readByteOrEof() // probe: first byte of the row-size int32
    if (first < 0) { current = null; return false }
    in.readLEFirst(first, 3) // row body size (informational; fields are self-describing)
    val bits = in.readBytes(nBitBytes)
    val row = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      val isNull = (bits(i / 8) & (1 << (8 - (i % 8) - 1))) != 0
      if (isNull) row.update(i, null)
      else row.update(i, decode(fields(i).dataType, directives(i)))
      i += 1
    }
    current = row
    true
  }

  private def decode(t: DataType, d: FieldDirective): Any = (t, d) match {
    // CHAR(N): N raw bytes, trailing space padding stripped; BINARY(N)
    // keeps all N zero-padded bytes
    case (StringType, FieldDirective.Fixed(n, _)) =>
      UTF8String.fromBytes(RowBinaryReader.stripTrailing(in.readBytes(n), ' '))
    case (BinaryType, FieldDirective.Fixed(n, _)) => in.readBytes(n)
    // UUID: msb + lsb, big-endian on the Vertica wire
    case (StringType, FieldDirective.Uuid) =>
      UTF8String.fromString(new java.util.UUID(in.readBE(8), in.readBE(8)).toString)
    case (LongType, _) => in.readLE(8)
    case (IntegerType, _) => in.readLE(8).toInt // Vertica INTEGER = 8 bytes
    case (ShortType, _) => in.readLE(8).toShort
    case (ByteType, _) => in.readLE(8).toByte
    case (DoubleType, _) => java.lang.Double.longBitsToDouble(in.readLE(8))
    case (FloatType, _) => // stored as 8-byte double
      java.lang.Double.longBitsToDouble(in.readLE(8)).toFloat
    case (BooleanType, _) => in.readByte() != 0
    case (StringType, _) => UTF8String.fromBytes(in.readBytes(in.readLE(4).toInt))
    case (BinaryType, _) => in.readBytes(in.readLE(4).toInt)
    case (TimestampType, _) => in.readLE(8) + VerticaNativeEncode.VerticaEpochMicros
    case (DateType, _) => (in.readLE(8) + VerticaNativeEncode.VerticaEpochDays).toInt
    case (other, _) => throw new UnsupportedOperationException(s"graft-vertica-native read: $other")
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

private[sources] class VerticaNativeWriterFactory(path: String, schema: StructType,
    fieldSpec: String, confProps: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new VerticaNativeWriter(path, schema, fieldSpec, partitionId,
      ConnectorFiles.restoreConf(confProps))
}

private[sources] case class VerticaNativeCommit(file: String) extends WriterCommitMessage

/** One `.vnative` file per task: header once, then framed rows encoded
  * with the SAME writers as the `graft_verticarow` expression. */
private[sources] class VerticaNativeWriter(path: String, schema: StructType,
    fieldSpec: String, partitionId: Int,
    conf: Configuration) extends DataWriter[InternalRow] {

  private val directives = FieldSpec.resolve(schema, FieldSpec.parse(fieldSpec))

  private val file = new Path(path, f"part-$partitionId%05d-${UUID.randomUUID()}.vnative")
  private val fs = file.getFileSystem(conf)
  private lazy val out = {
    val os = new BufferedOutputStream(fs.create(file, false), 1 << 16)
    os.write(VerticaNativeEncode.fileHeader(schema, fieldSpec))
    os
  }
  private val bodyBuf = new java.io.ByteArrayOutputStream(256)
  private val headBuf = new java.io.ByteArrayOutputStream(16)
  private val fields = schema.fields
  private val nBitBytes = (fields.length + 7) / 8
  private var opened = false

  override def write(row: InternalRow): Unit = {
    opened = true
    bodyBuf.reset(); headBuf.reset()
    val bits = new Array[Byte](nBitBytes)
    var i = 0
    while (i < fields.length) {
      if (row.isNullAt(i)) bits(i / 8) = (bits(i / 8) | (1 << (8 - (i % 8) - 1))).toByte
      else VerticaNativeEncode.writeValue(bodyBuf, fields(i).dataType, row, i, directives(i))
      i += 1
    }
    graft.functions.BinaryRowWriters.writeLE(headBuf, bodyBuf.size().toLong, 4)
    headBuf.write(bits, 0, nBitBytes)
    headBuf.writeTo(out)
    bodyBuf.writeTo(out)
  }

  override def commit(): WriterCommitMessage = {
    if (opened) out.close()
    VerticaNativeCommit(file.toString)
  }

  override def abort(): Unit = {
    // close() flushes, and on an already-broken stream that flush throws
    // the same error that triggered the abort — the delete below must
    // still run or the truncated file survives in the FINAL output dir
    // (files are written in place, there is no _temporary staging)
    if (opened) { try out.close() catch { case _: java.io.IOException => () } }
    if (fs.exists(file)) fs.delete(file, false)
  }
  override def close(): Unit = ()
}
