package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-ONLY wire-faithful fake of the kafka connector: a DSv2
  * micro-batch SOURCE exposing EXACTLY the kafka connector's read
  * schema (key/value binary, topic, partition, offset, timestamp,
  * timestampType) and option contract (`subscribe`,
  * `kafka.bootstrap.servers`, `startingOffsets`,
  * `maxOffsetsPerTrigger`), emitting records whose `value` payloads the
  * test injects via `fake.jsonlines` (one record per line).
  *
  * Injected through [[GraftLoader.KafkaTopic]]'s `format` seam, it
  * executes the PRODUCTION builder path — readStream options → load →
  * decode → transform/quarantine → sink — with zero kafka jars: the
  * contract test for everything graft owns on this surface. What it
  * deliberately does NOT fake: broker I/O and rebalancing — those
  * belong to the real connector and run under `tools/kafka-ci/`. Offset
  * ADMISSION is faked faithfully: like the real connector, the stream
  * implements SupportsTriggerAvailableNow, so `maxOffsetsPerTrigger`
  * paces consumption into MULTIPLE micro-batches (epochs) per run —
  * the shape that exercises every sink's multi-epoch commit protocol.
  *
  * Option-contract checks happen at stream build: a missing `subscribe`
  * or bootstrap servers — i.e. a regression in GraftLoader's option
  * plumbing — fails the test loudly rather than silently reading an
  * empty topic. */
class FakeKafkaSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafkaSource.wireSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FakeKafkaTable()
}

object FakeKafkaSource {
  /** The kafka connector's exact read schema. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Fixed record timestamp (2024-01-01T00:00:00Z in micros) — the
    * decode seam reads event time from the PAYLOAD, not the wire. */
  val wireTimestampMicros: Long = 1704067200000000L
}

private[streaming] class FakeKafkaTable extends Table with SupportsRead {
  override def name(): String = "fake-kafka"
  override def schema(): StructType = FakeKafkaSource.wireSchema
  // BATCH_READ mirrors the real connector's `spark.read.format("kafka")`
  // surface — the re-read path GraftLoader's kafka lookback rewind uses
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = FakeKafkaSource.wireSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FakeKafkaStream(options)
      override def toBatch: Batch = {
        // same option contract and reader as the stream; the whole
        // topic in one planned read (earliest → latest)
        val s = new FakeKafkaStream(options)
        new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            s.planInputPartitions(s.initialOffset(), s.latestOffset())
          override def createReaderFactory(): PartitionReaderFactory =
            s.createReaderFactory()
        }
      }
    }
}

private[streaming] class FakeKafkaOffset(val n: Long) extends Offset {
  override def json(): String = n.toString
}

private[streaming] class FakeKafkaStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // the option contract the real connector enforces — regression gate on
  // GraftLoader's plumbing
  private def required(k: String): String = {
    val v = options.get(k)
    require(v != null && v.nonEmpty, s"fake-kafka: required option '$k' not passed through")
    v
  }
  private val topic = required("subscribe")
  required("kafka.bootstrap.servers")
  require(options.get("startingOffsets") != null,
    "fake-kafka: startingOffsets not passed through")
  // ENFORCED like the real connector: maxOffsetsPerTrigger becomes the
  // default ReadLimit, so the runner admits that many records per epoch
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)
  private val lines: Array[String] =
    Option(options.get("fake.jsonlines")).map(_.split("\n")).getOrElse(Array.empty)

  override def initialOffset(): Offset = new FakeKafkaOffset(0L)
  // admission-control path (the runner calls this, not the no-arg form)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FakeKafkaOffset].n
    limit match {
      case rl: ReadMaxRows =>
        new FakeKafkaOffset(math.min(lines.length.toLong, s + rl.maxRows()))
      case _ => new FakeKafkaOffset(lines.length.toLong)
    }
  }
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  // AvailableNow contract: pin the run's end position up front (ours is
  // already static) — the runner then paces epochs toward it
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = new FakeKafkaOffset(lines.length.toLong)
  // no-arg form kept for the BATCH scan path (our own call site); the
  // admission-control runner never calls it once the trait is present
  override def latestOffset(): Offset = new FakeKafkaOffset(lines.length.toLong)
  override def deserializeOffset(json: String): Offset = new FakeKafkaOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeKafkaOffset].n.toInt
    val e = end.asInstanceOf[FakeKafkaOffset].n.toInt
    if (e <= s) Array.empty
    else Array(FakeKafkaPartition(topic, lines.slice(s, e), s.toLong))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val fp = p.asInstanceOf[FakeKafkaPartition]
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < fp.payloads.length }
          override def get(): InternalRow = {
            val off = fp.startOffset + i
            new GenericInternalRow(Array[Any](
              null, // key
              fp.payloads(i).getBytes("UTF-8"), // value
              UTF8String.fromString(fp.topic),
              (off % 2).toInt, // partition: records spread over 2 partitions
              off,
              FakeKafkaSource.wireTimestampMicros,
              0)) // timestampType: CREATE_TIME
          }
          override def close(): Unit = ()
        }
      }
    }
}

private[streaming] case class FakeKafkaPartition(
    topic: String, payloads: Array[String], startOffset: Long) extends InputPartition
