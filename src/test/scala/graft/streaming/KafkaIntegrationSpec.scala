package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** End-to-end gate for the [[GraftLoader.KafkaTopic]] ingest path — the
  * reference's whole production source (its KafkaSource/poll/commit
  * loop), which this sandbox cannot exercise because no kafka connector
  * jars ship with it. The test therefore GATES rather than fails:
  *
  *  - connector absent (this sandbox): `assume` cancels the test —
  *    yellow, not red — and the clean-failure contract stays pinned by
  *    StreamingSpec's data-source-not-found test;
  *  - connector present but no broker configured: cancelled, with the
  *    env var named in the message;
  *  - `spark-sql-kafka-0-10` on the classpath AND
  *    `GRAFT_KAFKA_BOOTSTRAP=host:port` set (CI with a testcontainers/
  *    embedded broker, or a dev box): the full path runs — produce
  *    JSON events through Spark's own kafka batch sink, ingest them via
  *    KafkaTopic → jsonEventDecoder → exactly-once partitioned file
  *    sink, and assert the landed rows.
  *
  * Everything touches kafka through DataFrame-API format strings only,
  * so this file compiles (and the suite loads) with zero kafka classes
  * on the classpath. */
class KafkaIntegrationSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kafka-integration-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def connectorPresent: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-kafka-it").toString

  behavior of "GraftLoader.KafkaTopic"

  it should "ingest a topic into the exactly-once file sink end to end" in {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 is not on the classpath (expected in this sandbox)")
    val servers = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(servers.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (e.g. from a testcontainers broker) to run")
    val topic = s"graft-it-${java.util.UUID.randomUUID().toString.take(8)}"

    // produce: 4 JSON events through Spark's own kafka batch sink
    import spark.implicits._
    val events = Seq(
      (0L, "2024-01-01T00:01:00Z", 1L, "click", 1.5, "{}"),
      (1L, "2024-01-01T00:02:00Z", 1L, "view", 2.0, "{}"),
      (2L, "2024-01-01T00:03:00Z", 2L, "purchase", 30.0, "{}"),
      (3L, "2024-01-01T00:04:00Z", 3L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events
      .select(to_json(struct(events.columns.map(col): _*)).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers.get)
      .option("topic", topic)
      .save()

    // consume: the production seam, earliest → decode → file sink
    val out = tmp()
    GraftLoader.builder()
      .source(GraftLoader.KafkaTopic(servers.get, topic,
        startingOffsets = "earliest", maxOffsetsPerTrigger = Some(2)))
      .sink(GraftLoader.PartitionedFiles(out))
      .checkpoint(tmp())
      .start(spark)
      .awaitTermination()

    val landed = spark.read.parquet(out)
    landed.count() shouldBe 4L
    landed.select("event_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(0L, 1L, 2L, 3L)
    landed.schema.fieldNames.toSet should contain allOf ("event_id", "user_id", "event_type")
  }

  // ALWAYS-RUN coverage of the KafkaTopic surface (r8 verdict: the seam
  // had never executed in this sandbox): [[FakeKafkaSource]] is a
  // wire-schema-faithful DSv2 micro-batch source injected through the
  // `format` seam, so the PRODUCTION builder path — option plumbing →
  // load → jsonEventDecoder → quarantine split → exactly-once file sink —
  // executes for real; only broker I/O is faked. The real-broker run
  // stays gated above (recipe: tools/kafka-ci/).
  it should "drive the KafkaTopic decode seam end to end through the wire-faithful fake" in {
    val out = tmp(); val dl = tmp()
    val good = Seq(
      """{"event_id":0,"ts":"2024-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":1,"ts":"2024-01-01T00:02:00Z","user_id":1,"event_type":"view","value":2.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T00:03:00Z","user_id":2,"event_type":"purchase","value":30.0,"props":"{}"}""",
      """{"event_id":3,"ts":"2024-01-01T00:04:00Z","user_id":3,"event_type":"click","value":0.5,"props":"{}"}""")
    // a malformed payload must flow to the dead-letter table, not crash
    // the poll loop (the reference formatter's skip-and-surface contract)
    val wire = (good :+ "not json at all {").mkString("\n")
    import org.apache.spark.sql.functions.{col, lit}
    val queries = GraftLoader.builder()
      .source(GraftLoader.KafkaTopic("fake:9092", "events-fake",
        startingOffsets = "earliest",
        maxOffsetsPerTrigger = Some(2),
        options = Map("fake.jsonlines" -> wire),
        format = "graft.streaming.FakeKafkaSource"))
      .quarantine(dl, bad = col("event_id").isNull, reason = lit("decode_failure"))
      .sink(GraftLoader.PartitionedFiles(out))
      .checkpoint(tmp())
      .startAll(spark)
    queries.foreach(_.awaitTermination())

    val landed = spark.read.parquet(out)
    landed.count() shouldBe 4L
    landed.select("event_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(0L, 1L, 2L, 3L)
    // decoded VALUES, not just arrival: the payload round-tripped the
    // wire `value` bytes through from_json
    landed.filter(col("event_id") === 2).select("event_type", "user_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) shouldBe
      Array(("purchase", 2L, 30.0))
    val dead = spark.read.parquet(dl)
    dead.count() shouldBe 1L
    dead.select("dl_reason").collect().map(_.getString(0)) shouldBe Array("decode_failure")
  }

  // --- exactly-once protocol matrix over the kafka wire schema ---
  // Each sink's commit protocol executes against the SAME wire-faithful
  // fake, so every protocol graft ships is exercised end to end from
  // kafka-shaped input: two-phase markers (replay skip), snapshot-table
  // metadata commits, and the lookback rewind (which drives the
  // connector's BATCH read surface through KafkaTopic's format seam).

  private def goodWire: String = Seq(
    """{"event_id":0,"ts":"2024-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""",
    """{"event_id":1,"ts":"2024-01-01T00:02:00Z","user_id":1,"event_type":"view","value":2.0,"props":"{}"}""",
    """{"event_id":2,"ts":"2024-01-01T00:03:00Z","user_id":2,"event_type":"purchase","value":30.0,"props":"{}"}""",
    """{"event_id":3,"ts":"2024-01-01T00:04:00Z","user_id":3,"event_type":"click","value":0.5,"props":"{}"}""").mkString("\n")

  // maxOffsetsPerTrigger=2 over 4 records: the fake ENFORCES admission
  // (SupportsTriggerAvailableNow, like the real connector), so every
  // protocol below runs across TWO epochs — multi-epoch commit paths,
  // not the degenerate single-epoch shape
  private def fakeTopic: GraftLoader.KafkaTopic = GraftLoader.KafkaTopic(
    "fake:9092", "events-fake", startingOffsets = "earliest",
    maxOffsetsPerTrigger = Some(2),
    options = Map("fake.jsonlines" -> goodWire),
    format = "graft.streaming.FakeKafkaSource")

  it should "commit kafka epochs exactly once through the two-phase protocol, skipping replays" in {
    val out = tmp()
    def run(): Unit = GraftLoader.builder()
      .source(fakeTopic)
      .sink(GraftLoader.TwoPhaseCommit(out))
      .checkpoint(tmp()) // FRESH checkpoint each run: epoch ids restart at 0
      .start(spark).awaitTermination()
    run()
    val sink = new Sinks.TwoPhaseCommitSink(out)
    val ids = sink.committedBatchIds(spark).sorted
    ids shouldBe Seq(0L, 1L) // 4 records / maxOffsetsPerTrigger=2 = 2 epochs
    spark.read.parquet(out).count() shouldBe 4L
    // checkpoint LOSS: the stream re-delivers the same epoch ids from
    // scratch; the marker files — not the checkpoint — are what make the
    // sink exactly-once, so the data must not duplicate
    run()
    spark.read.parquet(out).count() shouldBe 4L
    sink.committedBatchIds(spark).sorted shouldBe ids
    // each marker records its epoch's consumed ranges; rows tie out
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val contents = ids.map { id =>
      val in = fs.open(new org.apache.hadoop.fs.Path(out, s"_commits/$id"))
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    contents.map(_.split("rows=")(1).trim.toLong).sum shouldBe 4L
    contents.head should include ("click=0..0")
    contents.head should include ("view=1..1")
  }

  it should "publish kafka epochs as snapshot-table commits with a stable committed set" in {
    val table = tmp()
    def run(): Unit = GraftLoader.builder()
      .source(fakeTopic)
      .sink(GraftLoader.SnapshotTable(table))
      .checkpoint(tmp())
      .start(spark).awaitTermination()
    run()
    val sink = new SnapshotTableSink(table)
    sink.read(spark).count() shouldBe 4L
    val (snapId, committed) = sink.currentSnapshot(spark).get
    committed.sorted shouldBe Seq(0L, 1L) // two admitted epochs, both committed
    // checkpoint loss: the replayed epoch is recognized by the snapshot
    // metadata's committed set — no duplicate rows, no new snapshot
    run()
    sink.read(spark).count() shouldBe 4L
    sink.currentSnapshot(spark).get shouldBe ((snapId, committed))
  }

  it should "replay the lookback window from the kafka topic into the in-data-offset sink" in {
    import org.apache.spark.sql.functions.col
    val out = tmp()
    def run(iv: StreamInterval): Unit = GraftLoader.builder()
      .source(fakeTopic)
      .lookback(iv)
      .sink(GraftLoader.InDataOffsets(out))
      .checkpoint(tmp())
      .start(spark).awaitTermination()
    // first start: no committed position — rewind is a documented no-op
    run(StreamInterval.OffsetRange(2))
    val sink = new Sinks.InDataOffsetSink(out)
    sink.read(spark).count() shouldBe 4L
    sink.read(spark).filter(col("_batch_id") === Long.MaxValue).count() shouldBe 0L
    // restart with rewind: the last 2 committed records per partition
    // group re-read from the TOPIC (the connector's batch surface via
    // the format seam), re-published as an atomic replay epoch; the
    // groups are click(2)/view(1)/purchase(1), so the window holds all 4
    run(StreamInterval.OffsetRange(2))
    val all = sink.read(spark)
    all.filter(col("_batch_id") === Long.MaxValue).count() shouldBe 4L
    // live epochs did not duplicate (writeBatch skipped the replayed id)
    all.filter(col("_batch_id") =!= Long.MaxValue).count() shouldBe 4L
    // the consumer-side dedup view collapses the re-delivery
    sink.readDeduped(spark).count() shouldBe 4L
    sink.readDeduped(spark).select("event_id").collect()
      .map(_.getLong(0)).sorted shouldBe Array(0L, 1L, 2L, 3L)
  }

  it should "not let the lookback replay bypass the quarantine" in {
    import org.apache.spark.sql.functions.{col, lit}
    // a record with VALID positions INSIDE the committed range that a
    // validation rule quarantines (value < 0): decode-failure rows
    // self-exclude from the rewind via the positions join, but this
    // class passes it (clicks commit 0..10, the bad click is 5) and
    // must be filtered from the replay exactly like the live path
    val wire = Seq(
      """{"event_id":0,"ts":"2024-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":1,"ts":"2024-01-01T00:02:00Z","user_id":1,"event_type":"view","value":2.0,"props":"{}"}""",
      """{"event_id":5,"ts":"2024-01-01T00:03:00Z","user_id":5,"event_type":"click","value":-1.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T00:04:00Z","user_id":2,"event_type":"purchase","value":30.0,"props":"{}"}""",
      """{"event_id":10,"ts":"2024-01-01T00:05:00Z","user_id":3,"event_type":"click","value":0.5,"props":"{}"}""")
      .mkString("\n")
    val out = tmp(); val dl = tmp()
    def run(iv: StreamInterval): Unit = GraftLoader.builder()
      .source(fakeTopic.copy(options = Map("fake.jsonlines" -> wire)))
      .quarantine(dl, bad = col("value") < 0, reason = lit("negative_value"))
      .lookback(iv)
      .sink(GraftLoader.InDataOffsets(out))
      .checkpoint(tmp())
      .startAll(spark).foreach(_.awaitTermination())
    run(StreamInterval.OffsetRange(5))
    val sink = new Sinks.InDataOffsetSink(out)
    sink.read(spark).filter(col("value") < 0).count() shouldBe 0L
    spark.read.parquet(dl).count() shouldBe 1L
    // rewind: the bad record sits INSIDE the rewound window (its
    // event_id is the max committed click... it is not committed, but
    // its event_type/event_id pass the raw re-read) — the replay epoch
    // must still exclude it
    run(StreamInterval.OffsetRange(5))
    val all = sink.read(spark)
    all.filter(col("_batch_id") === Long.MaxValue).count() should be > 0L
    all.filter(col("value") < 0).count() shouldBe 0L
    sink.readDeduped(spark).count() shouldBe 4L
  }

  it should "reject a loader whose option plumbing drops the topic subscription" in {
    // contract check of the fake itself: the required-option gate fires
    // (guards the guard — a silent empty read would mask a plumbing bug)
    val ex = intercept[Throwable] {
      spark.readStream.format("graft.streaming.FakeKafkaSource")
        .option("kafka.bootstrap.servers", "fake:9092")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmp())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    msgs(ex).exists(_.contains("subscribe")) shouldBe true
  }
}
