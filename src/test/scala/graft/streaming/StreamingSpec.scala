package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-streaming-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def tmp(): String = Files.createTempDirectory("graft-test").toString

  private def eventsStream(rows: Seq[Ev]): (MemoryStream[Ev], org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows: _*)
    (ms, ms.toDF())
  }

  behavior of "RecordBatchingSink"

  it should "write time-partitioned files exactly once" in {
    import spark.implicits._
    val src = tmp(); val out = tmp(); val cp = tmp()
    Seq(
      Ev(0, ts(10), 1, "click", 1.0, "{}"),
      Ev(1, ts(20), 2, "view", 2.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-02 01:00:00"), 1, "click", 3.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    val stream = EventSource.fileStream(spark, src)
    Sinks.recordBatchingSink(stream, out, cp).start().awaitTermination()
    val result = spark.read.parquet(out)
    result.count() shouldBe 3
    result.select("dt").distinct().as[String].collect().sorted shouldBe Array("20240101", "20240102")
    // restart with same checkpoint: no duplicates (file-sink commit log)
    Sinks.recordBatchingSink(EventSource.fileStream(spark, src), out, cp).start().awaitTermination()
    spark.read.parquet(out).count() shouldBe 3
  }

  it should "sustain the exactly-once file sink throughput floor" in {
    // CI floor for the headline loader path (events → exactly-once
    // partitioned file sink): a CODE-side throughput regression (an
    // accidental per-row UDF, a lost salt repartition, a sink that
    // stopped batching) must fail here before the driver bench sees it.
    // The floor is deliberately ~3.4x under the measured local[2] rate
    // (~6.8k rows/s for this 10k-row corpus; the sf0.1 bench sustains
    // 50k+ on local[32]) so shared-VM stalls don't flake it — best of
    // two runs armors one-off host hiccups further. A real regression
    // of the kind this guards (per-row UDF, lost batching) costs an
    // order of magnitude, not 3x.
    val sfDir = "/root/testdata/sf0.01"
    val tmpRoot = tmp()
    val src = s"$tmpRoot/src"
    graft.Tables.events(spark, sfDir).repartition(8).write.parquet(src)
    val n = spark.read.parquet(src).count()
    def loadOnce(tag: String): Double = {
      val t0 = System.nanoTime()
      Sinks.recordBatchingSink(
        EventSource.fileStream(spark, src, maxFilesPerTrigger = 4),
        s"$tmpRoot/out-$tag", s"$tmpRoot/cp-$tag",
        writerTasksPerPartition = 2).start().awaitTermination()
      n / ((System.nanoTime() - t0) / 1e9)
    }
    loadOnce("warm") // one-time stream codegen/JIT, excluded from the gate
    var rate = math.max(loadOnce("timed1"), loadOnce("timed2"))
    if (rate < 2000.0) {
      // sustained shared-VM stalls are documented on this host class
      // (SURVEY: reproducible slowdowns on untouched code); one
      // time-separated retry discriminates a stall from a code
      // regression, which costs an order of magnitude, not 3x
      Thread.sleep(10000)
      rate = math.max(rate, loadOnce("timed3"))
    }
    info(f"sink throughput: $rate%.0f rows/s (floor 2000)")
    withClue(f"sink throughput $rate%.0f rows/s under floor: ") {
      rate should be >= 2000.0
    }
    // and the gated output is still complete + exactly-once shaped
    spark.read.parquet(s"$tmpRoot/out-timed1").count() shouldBe n
  }

  it should "support csv format and zstd-compressed parquet" in {
    import spark.implicits._
    val src = tmp()
    Seq(Ev(0, ts(10), 1, "click", 1.0, "{}"), Ev(1, ts(20), 2, "view", 2.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    val csvOut = tmp()
    Sinks.recordBatchingSink(EventSource.fileStream(spark, src), csvOut, tmp(),
      format = "csv").start().awaitTermination()
    spark.read.schema(EventSource.schema).csv(csvOut).count() shouldBe 2
    // round-trip: stream the csv sink output back in through a csv SOURCE
    val reread = tmp()
    Sinks.recordBatchingSink(
      EventSource.fileStream(spark, csvOut + "/dt=20240101", format = "csv"),
      reread, tmp()).start().awaitTermination()
    spark.read.parquet(reread).count() shouldBe 2
    val zstdOut = tmp()
    Sinks.recordBatchingSink(EventSource.fileStream(spark, src), zstdOut, tmp(),
      compression = Some("zstd")).start().awaitTermination()
    spark.read.parquet(zstdOut).count() shouldBe 2
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(zstdOut))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
    all(files) should include(".zstd.")
  }

  it should "compact many small files into the target count" in {
    import spark.implicits._
    val dir = tmp() + "/t"
    (0 until 50).map(i => Ev(i.toLong, ts(i % 60), i % 5, "click", 1.0, "{}"))
      .toDF().repartition(25).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    before should be >= 20
    val after = Sinks.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024)
    after shouldBe 1
    spark.read.parquet(dir).count() shouldBe 50
  }

  it should "preserve a partitioned layout when told its partition columns" in {
    import spark.implicits._
    val dir = tmp() + "/t"
    (0 until 40).map(i => Ev(i.toLong, ts(i % 60), i % 5, "click", 1.0, "{}"))
      .toDF().withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
      .repartition(10).write.partitionBy("dt").parquet(dir)
    Sinks.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024,
      partitionCols = Seq("dt")) should be >= 1
    // dt= dirs survive as real partition directories, not flat columns
    new java.io.File(dir).listFiles().count(_.getName.startsWith("dt=")) shouldBe 1
    val back = spark.read.parquet(dir)
    back.count() shouldBe 40
    back.select("dt").distinct().as[String].collect() shouldBe Array("20240101")
  }

  it should "refuse to compact a streaming file-sink table" in {
    import spark.implicits._
    val dir = tmp() + "/t"
    Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF().write.parquet(dir)
    // a _spark_metadata commit log marks a native streaming-sink table;
    // rewriting its files would orphan the log's committed file list
    new java.io.File(dir, "_spark_metadata").mkdirs()
    an[IllegalArgumentException] should be thrownBy Sinks.compact(spark, dir)
  }

  behavior of "TwoPhaseCommitSink"

  it should "commit batches with ranges in the manifest and skip replays" in {
    val (_, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 1, "view", 2.0, "{}"),
      Ev(2, ts(3), 2, "click", 3.0, "{}")))
    val out = tmp()
    val sink = new Sinks.TwoPhaseCommitSink(out)
    sink.attach(df, tmp()).awaitTermination()
    val committed = sink.committedBatchIds(spark)
    committed should contain(0L)
    spark.read.parquet(s"$out/batch=0").count() shouldBe 3
    // replaying the same epoch must be a no-op
    val replay = spark.read.parquet(s"$out/batch=0")
    sink.writeBatch(replay, 0L)
    sink.committedBatchIds(spark).count(_ == 0L) shouldBe 1
    spark.read.parquet(s"$out/batch=0").count() shouldBe 3
  }

  it should "commit MULTIPLE epochs (per-epoch markers, no manifest append)" in {
    // the old single-_manifest layout used FileSystem.append, which
    // throws on ChecksumFileSystem (file://) and object stores — the
    // second epoch's commit crashed the query; markers must not
    import spark.implicits._
    val out = tmp()
    val sink = new Sinks.TwoPhaseCommitSink(out)
    sink.writeBatch(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF(), 0L)
    sink.writeBatch(Seq(Ev(1, ts(2), 2, "view", 2.0, "{}")).toDF(), 1L)
    sink.writeBatch(Seq(Ev(2, ts(3), 3, "view", 3.0, "{}")).toDF(), 2L)
    sink.committedBatchIds(spark).sorted shouldBe Seq(0L, 1L, 2L)
    spark.read.parquet(s"$out/batch=1").count() shouldBe 1
    // a replay of a middle epoch is a no-op
    sink.writeBatch(Seq(Ev(9, ts(9), 9, "click", 9.0, "{}")).toDF(), 1L)
    spark.read.parquet(s"$out/batch=1").collect()(0).getLong(0) shouldBe 1L
  }

  it should "honor a legacy _manifest and tolerate a torn final line" in {
    import spark.implicits._
    val out = tmp()
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(new org.apache.hadoop.fs.Path(out, "_manifest"), true)
    // epoch 0 committed cleanly; a crash tore the line for epoch 1 —
    // an unparseable id means that commit never completed
    o.write("0:click=0..0;rows=1\n1garbage".getBytes("UTF-8")); o.close()
    val sink = new Sinks.TwoPhaseCommitSink(out)
    sink.committedBatchIds(spark) shouldBe Seq(0L)
    // new epochs commit as markers alongside the legacy file
    sink.writeBatch(Seq(Ev(1, ts(2), 2, "view", 2.0, "{}")).toDF(), 1L)
    sink.committedBatchIds(spark).sorted shouldBe Seq(0L, 1L)
  }

  it should "re-commit an epoch that crashed between publish and manifest write" in {
    import spark.implicits._
    val out = tmp()
    val sink = new Sinks.TwoPhaseCommitSink(out)
    val epoch = Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 2, "view", 2.0, "{}")).toDF()
    // simulate: phase 2 rename happened, manifest line was never written
    epoch.write.parquet(s"$out/batch=0")
    sink.committedBatchIds(spark) shouldBe empty
    // the retry must re-write the epoch and commit it exactly once
    sink.writeBatch(epoch, 0L)
    sink.committedBatchIds(spark) shouldBe Seq(0L)
    spark.read.parquet(s"$out/batch=0").count() shouldBe 2
  }

  it should "refuse a corrupt manifest epoch before anything becomes visible" in {
    // the streaming manifest-integrity gate (round 14, r13 verdict
    // item 6): a clean shard-manifest epoch commits; an epoch carrying
    // a dangling entry, a wrong claimed length and an offset break is
    // REFUSED before phase 2 — no data dir, no marker, loud failure
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "aaaa"), (2L, "bb"), (3L, "cccccc"))
      .toDF("doc_id", "text")
    val out = tmp()
    val sink = new Sinks.TwoPhaseCommitSink(out,
      epochGate = Some(Transforms.manifestEpochGate(docs)))
    // clean epoch: contiguous offsets from 0, dense rec_idx, true lengths
    val clean = Seq(
      (1L, 0L, 4L, 1L, 0L), (2L, 0L, 2L, 2L, 4L), (3L, 1L, 6L, 1L, 0L))
      .toDF("doc_id", "shard", "n_bytes", "rec_idx", "offset")
    sink.writeBatch(clean, 0L)
    sink.committedBatchIds(spark) shouldBe Seq(0L)
    spark.read.parquet(s"$out/batch=0").count() shouldBe 3
    // corrupt epoch: doc 99 is GONE (dangling), doc 3 claims 7 bytes
    // (actual 6) and entry 2's offset skips a byte (4 -> 5)
    val corrupt = Seq(
      (99L, 0L, 4L, 1L, 0L), (2L, 0L, 2L, 2L, 5L), (3L, 1L, 7L, 1L, 0L))
      .toDF("doc_id", "shard", "n_bytes", "rec_idx", "offset")
    val ex = the[IllegalStateException] thrownBy sink.writeBatch(corrupt, 1L)
    ex.getMessage should include("REFUSED epoch 1")
    ex.getMessage should include("dangling")
    ex.getMessage should include("offset break")
    ex.getMessage should include("length mismatch")
    // nothing published: no marker, no visible epoch dir
    sink.committedBatchIds(spark) shouldBe Seq(0L)
    new java.io.File(s"$out/batch=1").exists() shouldBe false
    // the unsharded lane is NOT gated: an epoch indexing a corpus
    // subset (doc 3 absent here) must still commit
    val subset = Seq((1L, 0L, 4L, 1L, 0L), (2L, 0L, 2L, 2L, 4L))
      .toDF("doc_id", "shard", "n_bytes", "rec_idx", "offset")
    sink.writeBatch(subset, 2L)
    sink.committedBatchIds(spark).sorted shouldBe Seq(0L, 2L)
  }

  behavior of "InDataOffsetSink"

  it should "store batch ids in the data and drop replayed epochs" in {
    val (_, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 2, "view", 2.0, "{}")))
    val out = tmp()
    val sink = new Sinks.InDataOffsetSink(out)
    sink.attach(df, tmp()).awaitTermination()
    sink.committedMaxBatchId(spark) shouldBe 0L
    sink.read(spark).count() shouldBe 2
    // replay epoch 0 → skipped
    sink.writeBatch(sink.read(spark).drop("_batch_id"), 0L)
    sink.read(spark).count() shouldBe 2
  }

  it should "re-write a crashed partial epoch instead of skipping it" in {
    import spark.implicits._
    val out = tmp()
    val sink = new Sinks.InDataOffsetSink(out)
    val epoch0 = Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF()
    sink.writeBatch(epoch0, 0L)
    // simulate a crash mid-write of epoch 1: data reached staging but the
    // publish rename never happened — it must stay invisible
    val epoch1 = Seq(Ev(1, ts(2), 2, "view", 2.0, "{}"), Ev(2, ts(3), 2, "view", 3.0, "{}")).toDF()
    epoch1.withColumn("_batch_id", lit(1L))
      .write.mode("overwrite").parquet(s"$out/_staging/1")
    sink.committedMaxBatchId(spark) shouldBe 0L
    sink.read(spark).count() shouldBe 1
    // the retry of epoch 1 must WRITE (not be masked by the partial data)
    sink.writeBatch(epoch1, 1L)
    sink.committedMaxBatchId(spark) shouldBe 1L
    sink.read(spark).count() shouldBe 3
    sink.read(spark).where(col("_batch_id") === 1L).count() shouldBe 2
  }

  it should "honor legacy flat-layout data when resuming" in {
    import spark.implicits._
    val out = tmp()
    // epochs 0..1 written by the old flat-append layout: root-level files
    Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF()
      .withColumn("_batch_id", lit(0L)).write.mode("append").parquet(out)
    Seq(Ev(1, ts(2), 2, "view", 2.0, "{}")).toDF()
      .withColumn("_batch_id", lit(1L)).write.mode("append").parquet(out)
    val sink = new Sinks.InDataOffsetSink(out)
    sink.committedMaxBatchId(spark) shouldBe 1L
    // replays of old epochs are skipped; the next epoch commits normally
    sink.writeBatch(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF(), 1L)
    sink.read(spark).count() shouldBe 2
    sink.writeBatch(Seq(Ev(2, ts(3), 3, "click", 3.0, "{}")).toDF(), 2L)
    sink.committedMaxBatchId(spark) shouldBe 2L
    sink.read(spark).count() shouldBe 3
  }

  it should "ignore lookback replay rows in flat-layout recovery" in {
    // a compaction can fold replay_<k> dirs (whose _batch_id is pinned
    // to Long.MaxValue) into root-level files; recovery taking a raw max
    // would jump to MaxValue and silently drop every future epoch
    import spark.implicits._
    val out = tmp()
    val sink = new Sinks.InDataOffsetSink(out)
    sink.writeBatch(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF(), 0L)
    Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")).toDF()
      .withColumn("_batch_id", lit(Long.MaxValue))
      .write.mode("append").parquet(out) // compacted-flat replay rows
    sink.committedMaxBatchId(spark) shouldBe 0L
    sink.writeBatch(Seq(Ev(1, ts(2), 2, "view", 2.0, "{}")).toDF(), 1L)
    sink.committedMaxBatchId(spark) shouldBe 1L
    sink.read(spark).filter(col("_batch_id") === 1L).count() shouldBe 1
  }

  it should "read schema-evolved epochs as one unioned schema" in {
    import spark.implicits._
    val out = tmp()
    val sink = new Sinks.InDataOffsetSink(out)
    sink.writeBatch(Seq((0L, "click")).toDF("event_id", "event_type"), 0L)
    // producer evolved: epoch 1 carries an extra column
    sink.writeBatch(Seq((1L, "view", 9.5)).toDF("event_id", "event_type", "score"), 1L)
    val all = sink.read(spark)
    all.columns.toSet shouldBe Set("event_id", "event_type", "score", "_batch_id")
    all.count() shouldBe 2
    all.filter(col("_batch_id") === 0L).select("score").collect()(0).isNullAt(0) shouldBe true
    all.filter(col("_batch_id") === 1L).select("score").collect()(0).getDouble(0) shouldBe 9.5
  }

  it should "recover an interrupted compaction swap" in {
    import spark.implicits._
    val dir = tmp() + "/t"
    (0 until 10).map(i => Ev(i.toLong, ts(i), 1, "click", 1.0, "{}"))
      .toDF().write.parquet(dir)
    // simulate a crash between the two swap renames: dir moved aside, tmp lost
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir), new org.apache.hadoop.fs.Path(dir + ".compact.old"))
    Sinks.recoverCompaction(spark, dir) shouldBe true
    spark.read.parquet(dir).count() shouldBe 10
    // a fresh compact over the recovered table still works end-to-end
    Sinks.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024) shouldBe 1
    spark.read.parquet(dir).count() shouldBe 10
  }

  behavior of "MultiFileCommit"

  it should "decide Any/All/Total like the reference combinators" in {
    import java.time.Duration
    val d = Duration.ofSeconds(1)
    val s = ReachedAnyOf(maxRecords = Some(10), maxBytes = Some(1000))
    val small = FileStats(d, 100, 2)
    val big = FileStats(d, 900, 9)
    MultiFileCommit.AnyFile(s).shouldCommit(Seq(small, big)) shouldBe false
    MultiFileCommit.AnyFile(s).shouldCommit(Seq(small, FileStats(d, 1000, 9))) shouldBe true
    MultiFileCommit.AllFiles(s).shouldCommit(Seq(FileStats(d, 1000, 1), small)) shouldBe false
    MultiFileCommit.AllFiles(s).shouldCommit(Seq(FileStats(d, 1000, 1), FileStats(d, 5, 10))) shouldBe true
    // totals: 100+900 bytes reach the 1000 budget even though no single file does
    MultiFileCommit.Total(s).shouldCommit(Seq(small, big)) shouldBe true
    MultiFileCommit.Total(s).shouldCommit(Seq(small)) shouldBe false
    MultiFileCommit.Total(s).shouldCommit(Seq.empty) shouldBe false
    ReachedAnyOf(maxDuration = Some(Duration.ofMinutes(1)))
      .shouldCommit(Duration.ofMinutes(2), 0, 0) shouldBe true
  }

  it should "jitter fuzzy commit thresholds, re-sampling only on commit" in {
    import java.time.Duration
    val f = new FuzzyReachedAnyOf(records = Some((100L, 10L)), seed = 42L)
    val first = f.currentThresholds._3.get
    // Gaussian around 100, sd 10: the draw is jittered but sane
    first should (be >= 60L and be <= 140L)
    // below-threshold checks must NOT re-sample (re-sampling every check
    // would bias commits toward any one low draw)
    (1L until first).foreach { n =>
      f.shouldCommit(Duration.ZERO, 0L, n) shouldBe false
      f.currentThresholds._3.get shouldBe first
    }
    f.shouldCommit(Duration.ZERO, 0L, first) shouldBe true
    // committed: a fresh draw (deterministic under the seed, and ~never
    // the previous one)
    val second = f.currentThresholds._3.get
    second should (be >= 60L and be <= 140L)
    // threshold draws vary across commits — the whole point of jitter
    val draws = (0 until 50).map { _ =>
      val t = f.currentThresholds._3.get
      f.shouldCommit(Duration.ZERO, 0L, t) shouldBe true
      t
    }
    draws.distinct.size should be > 10
    draws.foreach(_ should (be >= 50L and be <= 150L))
    // the size check only forces the by-name size every N records
    var sizings = 0
    val g = new FuzzyReachedAnyOf(bytes = Some((1000000L, 1L)), sizeCheckEvery = 10L, seed = 1L)
    (1 to 100).foreach(n => g.shouldCommit(Duration.ZERO, { sizings += 1; 0L }, n.toLong))
    sizings shouldBe 10
    // duration-only form still decides
    val h = new FuzzyReachedAnyOf(duration = Some((Duration.ofMinutes(1), Duration.ZERO)), seed = 2L)
    h.shouldCommit(Duration.ofMinutes(2), 0L, 0L) shouldBe true
    h.shouldCommit(Duration.ofSeconds(1), 0L, 0L) shouldBe false
  }

  it should "jitter distributed commit budgets deterministically per group" in {
    // pure fold: same (seed, group) ⇒ identical assignment; budgets vary
    // across commits; different groups draw different sequences
    def assign(seed: Long, groupSeed: Long, n: Int): Seq[Long] = {
      val f = new MultiFileCommit.FuzzyTotalFold(None, Some((10L, 2L)), seed)
      f.reset(groupSeed)
      (1 to n).map(_ => f.next(1L))
    }
    val a = assign(7L, 1L, 200)
    assign(7L, 1L, 200) shouldBe a                  // replay-deterministic
    assign(7L, 2L, 200) should not be a             // group decorrelation
    assign(8L, 1L, 200) should not be a             // seed decorrelation
    val sizes = a.groupBy(identity).values.map(_.size).toSeq
    sizes.distinct.size should be > 1               // budgets actually vary
    sizes.foreach(_ should (be >= 1 and be <= 20))  // sane Gaussian range
    // sink-level: the jittered budget still packs every record exactly once
    // and produces varying commit sizes
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = tmp(); val out = tmp() + "/table"; val cp = tmp()
    (0L until 40L).map(i => Ev(i, ts(i.toInt + 1), 1, "click", 1.0, "x" * 20))
      .toDF().write.mode("overwrite").parquet(src)
    Sinks.multiFileBatchingSink(
      EventSource.fileStream(spark, src, maxFilesPerTrigger = 8),
      out, cp,
      MultiFileCommit.Total(ReachedAnyOf(maxRecords = Some(8L))),
      jitter = Some((0.3, 42L)))
      .start().awaitTermination()
    val all = spark.read.parquet(s"$out/epoch_0")
    all.count() shouldBe 40
    val perCommit = all.groupBy(col("commit")).count()
      .collect().map(_.getLong(1)).toSeq
    perCommit.sum shouldBe 40L
    perCommit.distinct.size should be > 1 // jittered, not fixed-size packs
  }

  it should "drive the budgeted sink through the loader builder" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = tmp(); val out = tmp() + "/table"; val cp = tmp()
    (0L until 20L).map(i => Ev(i, ts(i.toInt + 1), 1, "click", 1.0, "x" * 20))
      .toDF().write.mode("overwrite").parquet(src)
    GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 8))
      .sink(GraftLoader.BudgetedFiles(out, maxRecords = Some(5L),
        jitter = Some((0.2, 7L))))
      .checkpoint(cp)
      .start(spark).awaitTermination()
    val all = spark.read.parquet(s"$out/epoch_0")
    all.count() shouldBe 20
    all.select(col("commit")).distinct().count() should be >= 2L
  }

  it should "roll commit batches under a Total(bytes) budget with one file each" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = tmp(); val out = tmp() + "/table"; val cp = tmp()
    // 6 records, one partition group, ~137 encoded bytes each; budget 300
    // → reset-per-commit batches of 3 and 3: each batch accumulates until
    // ITS OWN total reaches 300 (the crossing record stays, counters then
    // reset — overshoot never carries into the next batch)
    (0L until 6L).map(i => Ev(i, ts(10 * i.toInt + 1), 1, "click", 1.0, "x" * 100))
      .toDF().write.mode("overwrite").parquet(src)
    Sinks.multiFileBatchingSink(
      EventSource.fileStream(spark, src, maxFilesPerTrigger = 8),
      out, cp,
      MultiFileCommit.Total(ReachedAnyOf(maxBytes = Some(300L))))
      .start().awaitTermination()
    val all = spark.read.parquet(s"$out/epoch_0")
    all.count() shouldBe 6
    all.groupBy("commit").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap shouldBe Map(0 -> 3L, 1 -> 3L)
    // offset order preserved within batches: batch 0 = ids 0-2, batch 1 = 3-5
    all.filter(col("commit") === 0).select("event_id").collect()
      .map(_.getLong(0)).sorted shouldBe Array(0L, 1L, 2L)
    // the multi-file batch: exactly one file per (commit, dt)
    val files = new java.io.File(s"$out/epoch_0/group=click")
      .listFiles().filter(_.getName.startsWith("commit="))
    files.length shouldBe 2
    files.foreach { commitDir =>
      commitDir.listFiles().filter(_.getName.startsWith("dt=")).foreach { dtDir =>
        dtDir.listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1
      }
    }
    // fresh checkpoint replays epoch 0: the published epoch must not change
    Sinks.multiFileBatchingSink(
      EventSource.fileStream(spark, src, maxFilesPerTrigger = 8),
      out, tmp(),
      MultiFileCommit.Total(ReachedAnyOf(maxBytes = Some(300L))))
      .start().awaitTermination()
    spark.read.parquet(s"$out/epoch_0").count() shouldBe 6
  }

  it should "fold each partition group's budget independently" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = tmp(); val out = tmp() + "/table"; val cp = tmp()
    // two groups, interleaved ids; with shuffle.partitions=2 they may
    // share a task — the fold must reset its counters per group
    val rows = (0L until 6L).map(i => Ev(i, ts(10 * i.toInt + 1), 1, "click", 1.0, "x" * 100)) ++
      (6L until 10L).map(i => Ev(i, ts(10 * i.toInt + 1), 2, "view", 1.0, "x" * 100))
    rows.toDF().write.mode("overwrite").parquet(src)
    Sinks.multiFileBatchingSink(
      EventSource.fileStream(spark, src, maxFilesPerTrigger = 8),
      out, cp,
      MultiFileCommit.Total(ReachedAnyOf(maxRecords = Some(3L))))
      .start().awaitTermination()
    val all = spark.read.parquet(s"$out/epoch_0")
    // click: 6 records → commits 0,1 of 3 each; view: 4 records → 3 + 1,
    // numbering restarting at 0 for the second group
    all.groupBy("group", "commit").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap shouldBe
      Map(("click", 0) -> 3L, ("click", 1) -> 3L, ("view", 0) -> 3L, ("view", 1) -> 1L)
  }

  behavior of "GraftLoader builder"

  it should "wire source → transform → sink like the reference API" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = tmp()
    Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 2, "error", 2.0, "{}"),
      Ev(2, ts(3), 1, "view", 3.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    val out = tmp() + "/table"
    GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 4))
      .transform(_.filter(col("event_type") =!= "error"))
      .sink(GraftLoader.SnapshotTable(out))
      .checkpoint(tmp())
      .start(spark)
      .awaitTermination()
    new SnapshotTableSink(out).read(spark).count() shouldBe 2
  }

  it should "quarantine bad rows to a dead-letter table and keep the main sink clean" in {
    import spark.implicits._
    val src = tmp(); val out = tmp() + "/table"; val dlq = tmp() + "/dead"; val cp = tmp()
    // negative values = decode/validation failures; type 'error' = poison
    (0L until 12L).map(i => Ev(i, ts(10 * i.toInt), i % 3,
      if (i % 4 == 3) "error" else "click", if (i % 3 == 2) -i.toDouble else i.toDouble, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    def build() = GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 8))
      .transform(_.withColumn("doubled", col("value") * 2))
      .sink(GraftLoader.SnapshotTable(out))
      .checkpoint(cp)
      .quarantine(dlq,
        bad = col("value") < 0 || col("event_type") === "error",
        reason = when(col("value") < 0, "negative_value").otherwise("poison_type"))
    val qs = build().startAll(spark)
    qs.length shouldBe 2
    qs.foreach { q => q.awaitTermination() }
    val main = new SnapshotTableSink(out).read(spark)
    val dead = spark.read.parquet(dlq)
    // the two outputs PARTITION the input: nothing lost, nothing doubled
    main.count() + dead.count() shouldBe 12
    main.filter(col("value") < 0 || col("event_type") === "error").count() shouldBe 0
    // the transform ran only on clean rows; dead letters keep the raw shape
    main.columns should contain("doubled")
    dead.columns should not contain "doubled"
    dead.select("event_id", "dl_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(2L -> "negative_value", 3L -> "poison_type", 5L -> "negative_value",
        7L -> "poison_type", 8L -> "negative_value",
        11L -> "negative_value") // 11 is negative AND poison; value check wins
    // restart with no new data: both checkpoints resume, nothing re-emitted
    build().startAll(spark).foreach { q => q.awaitTermination() }
    new SnapshotTableSink(out).read(spark).count() + spark.read.parquet(dlq).count() shouldBe 12
  }

  it should "re-emit the lookback window on restart, then dedup to exactly-once" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = tmp(); val out = tmp() + "/table"; val cp = tmp()
    // click partition: ids 0,2,4,6,8 at :00,:20,:40,1:00,1:20
    // view partition:  ids 1,3,5,7,9 at :10,:30,:50,1:10,1:30
    (0L until 10L).map(i => Ev(i, ts(10 * i.toInt), i % 3,
      if (i % 2 == 0) "click" else "view", i.toDouble, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    def build(iv: StreamInterval) = GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 8))
      .transform(_.withColumn("doubled", col("value") * 2))
      .sink(GraftLoader.InDataOffsets(out))
      .checkpoint(cp)
      .lookback(iv)
    build(StreamInterval.Current).start(spark).awaitTermination()
    val sink = new Sinks.InDataOffsetSink(out)
    sink.read(spark).count() shouldBe 10
    val maxId = sink.committedMaxBatchId(spark)
    // restart with offset lookback 2: the last 2 committed records of each
    // partition are re-consumed FROM THE SOURCE and re-transformed
    build(StreamInterval.OffsetRange(2)).start(spark).awaitTermination()
    val replays = sink.read(spark).filter(col("_batch_id") === Long.MaxValue)
    replays.select("event_id").as[Long].collect().sorted shouldBe Array(6L, 7L, 8L, 9L)
    replays.select("doubled").as[Double].collect().sum shouldBe 2.0 * (6 + 7 + 8 + 9)
    // the replay epoch must NOT advance the stream's recovery position
    sink.committedMaxBatchId(spark) shouldBe maxId
    // duration lookback: watermark minus 30 min per partition → same 4 ids
    // (click wm 1:20 → ids at/after 0:50; view wm 1:30 → at/after 1:00)
    build(StreamInterval.WatermarkRange(java.time.Duration.ofMinutes(30)))
      .start(spark).awaitTermination()
    sink.read(spark).count() shouldBe 18
    // consumer-side dedup collapses re-deliveries; first delivery wins
    val dedup = sink.readDeduped(spark)
    dedup.count() shouldBe 10
    dedup.filter(col("_batch_id") === Long.MaxValue).count() shouldBe 0
    // lookback on a sink without epoch-addressed replay is rejected
    intercept[UnsupportedOperationException] {
      GraftLoader.builder()
        .source(GraftLoader.FileSource(src))
        .sink(GraftLoader.PartitionedFiles(tmp()))
        .checkpoint(tmp())
        .lookback(StreamInterval.OffsetRange(1))
        .start(spark)
    }
  }

  it should "expose the kafka source seam and fail cleanly without the connector" in {
    // this environment ships no kafka jars: building the stream must fail
    // with Spark's data-source-not-found, not an opaque downstream error
    val ex = intercept[Throwable] {
      GraftLoader.builder()
        .source(GraftLoader.KafkaTopic("broker:9092", "events",
          maxOffsetsPerTrigger = Some(10000)))
        .sink(GraftLoader.PartitionedFiles(tmp()))
        .checkpoint(tmp())
        .start(spark)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    msgs(ex).exists(m => m.toLowerCase.contains("kafka")) shouldBe true
    // the default decoder maps a kafka-shaped batch to the event schema
    import spark.implicits._
    val wire = Seq(
      ("""{"event_id":7,"ts":"2024-01-01T00:10:00Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""")
    ).toDF("value")
    val decoded = GraftLoader.Builder.jsonEventDecoder(wire)
    decoded.columns.toSeq shouldBe EventSource.schema.fieldNames.toSeq
    decoded.select("event_id").as[Long].collect() shouldBe Array(7L)
  }

  it should "load a stream into ClickHouse-RowBinary files end to end" in {
    import spark.implicits._
    val src = tmp()
    Seq(Ev(0, ts(1), 1, "click", 1.0, "{}"), Ev(1, ts(2), 2, "view", 2.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    val out = tmp()
    GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 4))
      .sink(GraftLoader.RowBinaryFiles(out))
      .checkpoint(tmp())
      .start(spark)
      .awaitTermination()
    val back = spark.read.format("graft.sources.RowBinarySource")
      .schema(EventSource.schema).load(out)
    back.count() shouldBe 2
    back.select("event_id").collect().map(_.getLong(0)).sorted shouldBe Array(0L, 1L)
    // restart from the same checkpoint: published epochs are not re-written
    GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 4))
      .sink(GraftLoader.RowBinaryFiles(out))
      .checkpoint(tmp()) // fresh checkpoint → epoch 0 REPLAYS, must be skipped
      .start(spark)
      .awaitTermination()
    spark.read.format("graft.sources.RowBinarySource")
      .schema(EventSource.schema).load(out).count() shouldBe 2
  }

  it should "load a stream into proto record files end to end" in {
    import spark.implicits._
    val src = tmp()
    Seq(Ev(0, ts(1), 1, "click", 1.0, "{}"), Ev(1, ts(2), 2, "view", 2.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    val out = tmp()
    GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 4))
      .sink(GraftLoader.ProtoFiles(out))
      .checkpoint(tmp())
      .start(spark)
      .awaitTermination()
    val back = spark.read.format("graft.sources.ProtoFileSource")
      .schema(EventSource.schema).load(out)
    back.count() shouldBe 2
    back.orderBy("event_id").select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((0L, "click"), (1L, "view"))
    // replay from a fresh checkpoint: the published epoch must be skipped
    GraftLoader.builder()
      .source(GraftLoader.FileSource(src, maxFilesPerTrigger = 4))
      .sink(GraftLoader.ProtoFiles(out))
      .checkpoint(tmp())
      .start(spark)
      .awaitTermination()
    spark.read.format("graft.sources.ProtoFileSource")
      .schema(EventSource.schema).load(out).count() shouldBe 2
  }

  behavior of "Transforms"

  it should "aggregate tumbling windows with watermark" in {
    val (_, df) = eventsStream(Seq(
      Ev(0, ts(10), 1, "click", 1.0, "{}"),
      Ev(1, ts(40), 2, "click", 2.0, "{}"),
      Ev(2, ts(70), 1, "view", 4.0, "{}")))
    val q = Transforms.windowedAggregation(df)
      .writeStream.format("memory").queryName("win").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win").collect()
    rows.map(_.getLong(2)).sum shouldBe 3
    rows.length shouldBe 2 // (hour0, click ×2), (hour1, view)
  }

  it should "drop duplicate offsets within the watermark" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(0, ts(1), 1, "click", 1.0, "{}"), // exact replay
      Ev(1, ts(2), 2, "view", 2.0, "{}")))
    val q = Transforms.streamDedup(df)
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("dedup").count() shouldBe 2
  }

  it should "dedup streamed documents by normalized content, first arrival wins" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    ms.addData(
      (0L, ts(1), "Hello, World!"),
      (1L, ts(2), "hello world"), // same normalized content → dropped
      (2L, ts(3), "something else"))
    val q = Transforms.contentDedup(
        ms.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("cdedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("cdedup").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(0L, 2L) // first arrival of the duplicate content wins
    // the synthetic hash column does not leak into the output
    spark.table("cdedup").columns should contain theSameElementsAs
      Seq("doc_id", "ts", "text")
  }

  it should "gate encoding-damaged documents on ingest without destroying uncovered scripts" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      0L -> "clean latin text with words and 123 numbers",
      1L -> "日本語のテキストは問題ない、句読点も。", // CJK incl. CJK punctuation — passes
      2L -> "m��jib�ke ��� br�ken", // replacement chars → bad spike → dropped
      3L -> "", // no signal — passes (quality rules own empty docs)
      4L -> ("mostly fine text with one stray � char " * 2), // under threshold
      5L -> "Ελληνικό κείμενο χωρίς κανένα πρόβλημα", // Greek: UNCOVERED script, healthy — must PASS
      6L -> "ctl \u0001\u0002\u0003 damaged \u0007\u0008 text") // C0 controls -> dropped
    val expected = Array(0L, 1L, 3L, 4L, 5L)
    val ms = MemoryStream[(Long, Timestamp, String)]
    ms.addData(docs.map { case (id, t) => (id, ts(id.toInt + 1), t) }: _*)
    val q = Transforms.scriptGate(ms.toDF().toDF("doc_id", "ts", "text"), maxBadShare = 0.05)
      .writeStream.format("memory").queryName("sgate").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("sgate").collect().map(_.getLong(0)).sorted shouldBe expected
    // the census column does not leak into the output
    spark.table("sgate").columns should contain theSameElementsAs
      Seq("doc_id", "ts", "text")
    // stream ≡ batch: the gate's verdict matches the batch census's
    // bad-share for every fixture doc (one shared kernel)
    docs.foreach { case (id, t) =>
      val cps = t.codePoints().toArray
      val bad = cps.count(graft.functions.ScriptCensus.slotOf(_) == 8)
      val passes = cps.isEmpty || bad <= 0.05 * cps.length
      withClue(s"doc $id: ") {
        passes shouldBe expected.contains(id)
      }
    }
  }

  it should "gate boilerplate pages against a history line filter, pseudo-lines included" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val header = "nav home about contact"
    val footer = "copyright terms privacy cookies"
    val wall16 = (1 to 16).map(i => s"wall$i").mkString(" ")
    // driver recompute of the SHARED segmentation (TextFns.lineSegments):
    // \r?\n split, trim, drop empties, aligned 16-token chunks
    def segsOf(text: String): Seq[String] =
      text.split("\\r?\\n").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { line =>
        line.split("\\s+").filter(_.nonEmpty).grouped(16).map(_.mkString(" "))
      }
    val history = Seq(
      (100L, s"$header\n${(1 to 9).map(i => s"h$i").mkString(" ")}\n$footer"),
      (101L, s"$wall16 ${(1 to 20).map(i => s"hw$i").mkString(" ")}"))
      .toDF("doc_id", "text")
    val nLines = history.collect().map(r => segsOf(r.getString(1)).size).sum
    val bf = Transforms.buildLineBloom(history, nLines.toLong)
    val docs = Seq(
      0L -> s"$header\n${(1 to 10).map(i => s"a$i").mkString(" ")}\n$footer", // 2/3 dup -> drop
      1L -> (1 to 12).map(i => s"fresh$i").mkString(" "),                     // clean -> pass
      2L -> header,                                                           // 1/1 dup -> drop
      3L -> "",                                                               // no signal -> pass
      4L -> s"${(1 to 5).map(i => s"b$i").mkString(" ")}\n${(6 to 10).map(i => s"b$i").mkString(" ")}\n${(11 to 15).map(i => s"b$i").mkString(" ")}\n$footer", // 1/4 -> pass
      5L -> s"$wall16 ${(1 to 24).map(i => s"c$i").mkString(" ")}")           // aligned banner 1/3 -> drop
    val expected = Array(1L, 3L, 4L)
    val ms = MemoryStream[(Long, Timestamp, String)]
    ms.addData(docs.map { case (id, t) => (id, ts(id.toInt + 1), t) }: _*)
    val q = Transforms.lineDupGate(ms.toDF().toDF("doc_id", "ts", "text"), bf)
      .writeStream.format("memory").queryName("lgate").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("lgate").collect().map(_.getLong(0)).sorted shouldBe expected
    spark.table("lgate").columns should contain theSameElementsAs
      Seq("doc_id", "ts", "text")
    // stream ≡ batch ≡ driver: the gate applied to the same frame as a
    // batch call keeps the same docs, and a driver recompute of
    // (segments, history hits) predicts every verdict (zero false
    // negatives: a truly-known line ALWAYS probes true)
    val batchKept = Transforms.lineDupGate(
        docs.toDF("doc_id", "text"), bf)
      .collect().map(_.getLong(0)).sorted
    batchKept shouldBe expected
    val historyLines = history.collect().flatMap(r => segsOf(r.getString(1))).toSet
    docs.foreach { case (id, t) =>
      val segs = segsOf(t)
      val hits = segs.count(historyLines)
      val passes = segs.isEmpty || hits < 0.3 * segs.size
      withClue(s"doc $id (${segs.size} segs, $hits hits): ") {
        passes shouldBe expected.contains(id)
      }
    }
    // the fold-based segmentation matches the driver chunker on edge
    // shapes: exact 16-multiples, 1 token, CRLF, blank/whitespace lines
    val edges = Seq(
      (1 to 32).map(i => s"e$i").mkString(" "),       // exact 2 chunks
      "solo",                                          // 1 token
      s"a b\r\nc d\r\n\r\n   \r\ne f",                // CRLF + blanks
      " \t ",                                          // whitespace only
      (1 to 17).map(i => s"x$i").mkString(" "))        // 16 + 1 tail
    val got = edges.toDF("text")
      .select(graft.functions.TextFns.lineSegments(org.apache.spark.sql.functions.col("text"), 16))
      .collect().map(_.getSeq[String](0).toSeq)
    got shouldBe edges.map(segsOf)
  }

  it should "cut known duplicated spans in-stream exactly as the batch dd_span_trim" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Corpus where every duplicated span is shared ACROSS docs (no
    // intra-doc repeats — the history rule and the corpus-count rule
    // coincide there) and bodies are unique: batch dd_span_trim cuts
    // exactly the threshold spans. Stream side builds its history from
    // the OTHER docs (the lineTrim leave-one-out shape), so a doc's
    // duplicated windows are all IN history and its unique body is not
    // — streamed cleaned text must equal the batch's per doc.
    val big = (1 to 60).map(i => s"big$i").mkString(" ")     // >= 50: cut
    val small = (1 to 12).map(i => s"small$i").mkString(" ") // < 50: kept
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      0L -> s"${uniq("a", 10)} $big ${uniq("b", 10)} $small ${uniq("c", 10)}",
      1L -> s"${uniq("d", 10)} $big ${uniq("e", 10)} $small ${uniq("f", 10)}",
      2L -> uniq("u", 30), // untouched: token-normalized passthrough
      3L -> "",            // no tokens: unchanged passthrough, zero ledger
      4L -> big)           // all one shared span: cleaned text is empty
    val dir = java.nio.file.Files.createTempDirectory("graft-spantrim-st").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.operators.Dedup.ddSpanTrim(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("cleaned_text"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("removed_tokens"))).toMap
    batch(0L)._3 shouldBe 60L // precondition: the fixture exercises the cut
    val results = docs.map { case (id, text) =>
      val history = docs.filter(_._1 != id).map(_._2).toDF("text")
      val bf = Transforms.buildSpanBloom(history, 512L, fpp = 1e-6)
      val ms = MemoryStream[(Long, Timestamp, String)]
      ms.addData((id, ts(id.toInt + 1), text))
      val q = Transforms.spanTrim(ms.toDF().toDF("doc_id", "ts", "text"), bf)
        .writeStream.format("memory").queryName(s"strim$id")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      id -> spark.table(s"strim$id").collect().head
    }.toMap
    // doc 3 has no tokens: unchanged passthrough, zero accounting
    results(3L).getAs[String]("text") shouldBe ""
    results(3L).getAs[Long]("n_tokens") shouldBe 0L
    results(3L).getAs[Long]("removed_tokens") shouldBe 0L
    docs.map(_._1).filter(_ != 3L).foreach { id =>
      val (cleaned, kept, removed) = batch(id)
      val s = results(id)
      withClue(s"doc $id: ") {
        s.getAs[String]("text") shouldBe cleaned
        s.getAs[Long]("kept_tokens") shouldBe kept
        s.getAs[Long]("removed_tokens") shouldBe removed
      }
    }
  }

  it should "trim known boilerplate lines in-stream exactly as the batch dd_line_trim" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Corpus where every duplicated line is shared across ≥2 docs and
    // bodies are unique: batch dd_line_trim removes exactly the shared
    // lines. Stream side builds its history from the OTHER docs (the
    // production shape: the filter knows yesterday's boilerplate), so a
    // doc's duplicated lines are all IN history and its unique body is
    // not — streamed cleaned text must equal the batch's per doc.
    val header = "nav home about contact"
    val footer = "copyright terms privacy cookies"
    val docs = Seq(
      0L -> s"$header\n${(1 to 10).map(i => s"a$i").mkString(" ")}\n$footer",
      1L -> s"$header\n${(1 to 12).map(i => s"b$i").mkString(" ")}\n$footer",
      2L -> s"${(1 to 7).map(i => s"c$i").mkString(" ")}\n$footer",
      3L -> "", // no segments: passes through unchanged, zero accounting
      4L -> s"$header") // all-boilerplate: cleaned text is empty
    val dir = java.nio.file.Files.createTempDirectory("graft-linetrim").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.operators.Dedup.ddLineTrim(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("cleaned_text"), r.getAs[Long]("kept_lines"),
          r.getAs[Long]("removed_lines"))).toMap
    val results = docs.map { case (id, text) =>
      val history = docs.filter(_._1 != id).map(_._2).toDF("text")
      val bf = Transforms.buildLineBloom(history, 64L, fpp = 1e-6)
      val ms = MemoryStream[(Long, Timestamp, String)]
      ms.addData((id, ts(id.toInt + 1), text))
      val q = Transforms.lineTrim(ms.toDF().toDF("doc_id", "ts", "text"), bf)
        .writeStream.format("memory").queryName(s"ltrim$id")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      id -> spark.table(s"ltrim$id").collect().head
    }.toMap
    // doc 3 has no segments: unchanged passthrough, zero accounting
    results(3L).getAs[String]("text") shouldBe ""
    results(3L).getAs[Long]("n_lines") shouldBe 0L
    results(3L).getAs[Long]("removed_lines") shouldBe 0L
    batch.keySet shouldBe Set(0L, 1L, 2L, 4L) // batch omits no-segment docs
    batch.foreach { case (id, (cleaned, kept, removed)) =>
      val s = results(id)
      withClue(s"doc $id: ") {
        s.getAs[String]("text") shouldBe cleaned
        s.getAs[Long]("kept_lines") shouldBe kept
        s.getAs[Long]("removed_lines") shouldBe removed
      }
    }
  }

  it should "drop perceptual near-dups on ingest, first arrival wins" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def phash(text: String): Long = { // the mm_phash kernel, driver-side
      val stride = math.max(1, text.length / 64)
      val s = (0 until 64).map(k => text.codePointAt(math.min(1 + k * stride, text.length) - 1))
      val tot = s.sum
      (0 until 16).map(j => if ((0 until 4).map(i => s(4 * j + i)).sum * 16 > tot) 1L << j else 0L).sum
    }
    val base = (0 until 256).map(i => ('a' + i % 26).toChar).mkString
    // a byte change at an UNSAMPLED position (130 ≡ 2 mod the stride-4
    // sampling grid): md5 differs — contentDedup would pass it — but the
    // perceptual fingerprint is untouched, the re-encode story
    val reenc = base.updated(129, 'q')
    val other = "a" * 128 + "z" * 128
    reenc should not be base
    phash(reenc) shouldBe phash(base) // precondition: invisible to the hash
    phash(other) should not be phash(base)
    val ms = MemoryStream[(Long, Timestamp, String)]
    ms.addData((0L, ts(1), base), (1L, ts(2), reenc), (2L, ts(3), other),
      (3L, ts(4), ""), (4L, ts(5), "")) // empties: exact-class fallback
    val q = Transforms.perceptualDedup(ms.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("pdedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("pdedup").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(0L, 2L, 3L)
    spark.table("pdedup").columns should contain theSameElementsAs
      Seq("doc_id", "ts", "text")
  }

  it should "tokenize a stream identically to the batch BPE applier" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val merges = graft.operators.TextAnalysis.trainedBpeMerges(spark, sf)
      .map(m => (m._2, m._3))
    merges should not be empty // precondition: the corpus trains merges
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), ts(r.getLong(0).toInt), r.getString(1)))
    val ms = MemoryStream[(Long, Timestamp, String)]
    ms.addData(docs.toSeq)
    val q = Transforms.bpeTokens(ms.toDF().toDF("doc_id", "ts", "text"), merges)
      .select("doc_id", "n_pieces")
      .writeStream.format("memory").queryName("bpetok").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("bpetok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.TextAnalysis.taBpeApply(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_pieces")).toMap
    streamed shouldBe batch // a streamed piece is a batch piece
  }

  it should "sessionize with session_window" in {
    val (_, df) = eventsStream(Seq(
      Ev(0, ts(0), 1, "click", 1.0, "{}"),
      Ev(1, ts(10), 1, "click", 1.0, "{}"),  // same session (10 < 30 gap)
      Ev(2, ts(120), 1, "click", 1.0, "{}"), // new session
      Ev(3, ts(5), 2, "view", 1.0, "{}")))
    val q = Transforms.sessionize(df)
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess").collect()
    rows.length shouldBe 3
    rows.filter(_.getLong(2) == 1L).map(_.getLong(3)).sorted shouldBe Array(1L, 2L)
  }

  it should "emit sessions exactly when they close (event-time timeout)" in {
    import org.apache.spark.sql.functions.col
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(0), 1, "click", 1.0, "{}"),
      Ev(1, ts(10), 1, "click", 2.0, "{}"),   // same session as ev 0
      Ev(2, ts(0), 3, "view", 1.0, "{}"),
      Ev(3, ts(120), 3, "view", 1.0, "{}")))  // in-batch gap → closes first
    val q = Transforms.sessionizeOnClose(spark, df)
      .writeStream.format("memory").queryName("closed").outputMode("append").start()
    q.processAllAvailable()
    // the in-batch-gap close is out immediately; the no-data watermark
    // batch (wm = t120 - 30min = t90) then times out user 1 (t10+30 < t90)
    spark.table("closed").count() shouldBe 2
    // batch 2: an out-of-order event for user 3 at t95 (≥ wm, before the
    // open session's t120 start) must MERGE and lower session_start;
    // the watermark advance to t570 then times the session out
    ms.addData(Ev(4, ts(600), 2, "view", 1.0, "{}"), Ev(5, ts(95), 3, "view", 2.0, "{}"))
    q.processAllAvailable()
    ms.addData(Ev(6, ts(610), 2, "view", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("closed").collect()
    rows.length shouldBe 3
    val u1 = rows.filter(_.getLong(0) == 1L)
    u1.length shouldBe 1
    u1(0).getLong(3) shouldBe 2       // n_events
    u1(0).getDouble(4) shouldBe 3.0   // session_value
    // session_end is the session_window BOUNDARY (last event + gap), so
    // the emitted rows agree with the batch twin `sessionize`
    u1(0).getTimestamp(2) shouldBe ts(10 + 30) // last event t10 + 30min gap
    val u3 = rows.filter(_.getLong(0) == 3L).sortBy(_.getTimestamp(1).getTime)
    u3.length shouldBe 2
    u3(0).getLong(3) shouldBe 1                    // t0 singleton
    u3(1).getTimestamp(1) shouldBe ts(95)          // start lowered by late merge
    u3(1).getLong(3) shouldBe 2                    // t95 + t120
    spark.table("closed").filter(col("user_id") === 2).count() shouldBe 0 // still open
  }

  it should "assign streamed embeddings to trained centroids and report drift" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 2-dim toy model: centroid 0 at (0,0), centroid 1 at (10,10)
    val cents = Seq(0 -> Seq(0.0, 0.0), 1 -> Seq(10.0, 10.0))
    val rows = Seq(
      (0L, ts(5), Seq(1.0, 0.0)),    // → c0, d=1
      (1L, ts(10), Seq(9.0, 10.0)),  // → c1, d=1
      (2L, ts(20), Seq(5.0, 5.0)),   // equidistant → tie to lowest cid (c0), d=50
      (3L, ts(70), Seq(12.0, 10.0))) // next window → c1, d=4
    val ms = MemoryStream[(Long, Timestamp, Seq[Double])]
    ms.addData(rows: _*)
    val stream = ms.toDF().toDF("vec_id", "ts", "e")
    val q = Transforms.centroidDrift(stream, cents)
      .writeStream.format("memory").queryName("drift").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val drift = spark.table("drift").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    drift.size shouldBe 3
    drift((ts(0), 0L)) shouldBe ((2L, (1.0 + 50.0) / 2)) // tie went to c0
    drift((ts(0), 1L)) shouldBe ((1L, 1.0))
    drift((ts(60), 1L)) shouldBe ((1L, 4.0))
    // batch-stream parity: the same assignment expression over the same
    // rows as a plain DataFrame gives identical (cluster, dist) pairs
    val batch = Transforms.centroidAssign(
        rows.toDF("vec_id", "ts", "e"), cents)
      .select($"vec_id", $"cluster", $"dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    batch shouldBe Set((0L, 0L, 1.0), (1L, 1L, 1.0), (2L, 0L, 50.0), (3L, 1L, 4.0))
  }

  it should "compute the same windows as the batch operator (batch-stream parity)" in {
    // stream the real sf0.001 events table through windowedAggregation and
    // compare against the batch twin ev_tumbling.
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).write.mode("overwrite").parquet(src)
    val q = Transforms.windowedAggregation(EventSource.fileStream(spark, src, 4))
      .writeStream.format("memory").queryName("parity").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("parity")
      .select(col("window_start"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.EventAnalytics.evTumbling(spark, sf)
      .select(col("hour_start"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    streamed shouldBe batch
  }

  it should "build bit-identical count-min cells in batch and stream" in {
    // the streaming sketch build must agree cell-for-cell with the batch
    // construction over the same events (shared SketchFns hashes)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).write.mode("overwrite").parquet(src)
    val q = Transforms.countMinCells(EventSource.fileStream(spark, src, 4))
      .writeStream.format("memory").queryName("cm_cells").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cm_cells").collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.Tables.events(spark, sf)
      .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
        explode(graft.functions.SketchFns.cmPairs(col("user_id"))).as("rb"))
      .groupBy(col("window_start"), col("rb.j").as("j"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    streamed shouldBe batch
    // the key space really is bounded: ≤ 4×32 cells per window
    val perWindow = spark.table("cm_cells").groupBy(col("window_start")).count()
    perWindow.filter(col("count") > 128).count() shouldBe 0L
  }

  it should "drop every historical duplicate through the bloom gate, keeping most fresh docs" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // history: 2000 docs; stream: 500 exact clones + 500 normalized
    // clones (case/punct noise — the gate hashes NORMALIZED content)
    // + 2000 fresh docs
    val hist = (0 until 2000).map(i => (i.toLong, s"historical document number $i body"))
      .toDF("doc_id", "text")
    val clones = (0 until 500).map(i => (10000L + i, s"historical document number $i body")) ++
      (500 until 1000).map(i => (10000L + i, s"HISTORICAL, document number $i body!"))
    val fresh = (0 until 2000).map(i => (20000L + i, s"genuinely new content item $i"))
    val stream = (clones ++ fresh).toDF("doc_id", "text")
    val kept = Transforms.bloomDedup(stream, hist, expectedItems = 2000L, fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    // zero false negatives: every clone (exact or normalized) is dropped
    kept.count(_ < 20000L) shouldBe 0
    // false-positive rate on fresh content stays near the configured fpp
    val freshKept = kept.count(_ >= 20000L)
    freshKept should be >= 1900 // ≤5% dropped at fpp=1% (generous margin)
    // the gate is a stateless predicate: it must also run on a stream
    val (_, df) = eventsStream(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")))
    val gated = Transforms.bloomDedup(
      df.withColumnRenamed("props", "text"), hist, 2000L, 0.01)
    gated.isStreaming shouldBe true
    val q = gated.writeStream.format("memory").queryName("bloomed")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("bloomed").count() shouldBe 1 // "{}" is not in the history
  }

  it should "round-trip the bloom filter through save/load with identical gating" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hist = (0 until 500).map(i => (i.toLong, s"seen doc $i")).toDF("doc_id", "text")
    val stream = ((0 until 100).map(i => (1000L + i, s"seen doc $i")) ++
      (0 until 100).map(i => (2000L + i, s"new doc $i"))).toDF("doc_id", "text")
    val filter = Transforms.buildBloom(hist, 500L, 0.01)
    val path = tmp() + "/history.bloom"
    Transforms.saveBloom(spark, filter, path)
    val loaded = Transforms.loadBloom(spark, path)
    loaded shouldBe filter // byte-exact round trip
    val keptDirect = Transforms.bloomGate(stream, filter)
      .select("doc_id").as[Long].collect().toSet
    val keptLoaded = Transforms.bloomGate(stream, loaded)
      .select("doc_id").as[Long].collect().toSet
    keptLoaded shouldBe keptDirect        // identical gating after reload
    keptLoaded.count(_ < 2000L) shouldBe 0 // dupes still all dropped
    // a re-save over an existing file replaces it atomically
    Transforms.saveBloom(spark, filter, path)
    Transforms.loadBloom(spark, path) shouldBe filter
  }

  it should "gate through sharded history filters with zero false negatives" in {
    import spark.implicits._
    // same corpus as the monolithic gate spec, split across 8 shards
    val hist = (0 until 2000).map(i => (i.toLong, s"historical document number $i body"))
      .toDF("doc_id", "text")
    val clones = (0 until 500).map(i => (10000L + i, s"historical document number $i body")) ++
      (500 until 1000).map(i => (10000L + i, s"HISTORICAL, document number $i body!"))
    val fresh = (0 until 2000).map(i => (20000L + i, s"genuinely new content item $i"))
    val stream = (clones ++ fresh).toDF("doc_id", "text")
    val kept = Transforms.bloomDedupSharded(stream, hist, expectedItems = 2000L,
      fpp = 0.01, shards = 8).select("doc_id").as[Long].collect().toSet
    kept.count(_ < 20000L) shouldBe 0   // every clone dropped, exact or normalized
    kept.count(_ >= 20000L) should be >= 1900 // fresh false-drop stays near fpp
    // the sharded gate adds no schema residue
    Transforms.bloomDedupSharded(stream, hist, 2000L, 0.01, 8)
      .columns.toSeq shouldBe Seq("doc_id", "text")
  }

  it should "keep documents that hash to shards with no history" in {
    import spark.implicits._
    // 4 historical docs over 64 shards: most shards have NO filter row,
    // and the left-join miss must read as "not in history", not a drop
    val hist = (0 until 4).map(i => (i.toLong, s"tiny history $i")).toDF("doc_id", "text")
    val fresh = (0 until 200).map(i => (100L + i, s"spread-out fresh doc $i")).toDF("doc_id", "text")
    val filters = Transforms.buildBloomSharded(hist, 4L, 0.01, shards = 64).persist()
    filters.count() should be <= 4L // at most one row per occupied shard
    val kept = Transforms.bloomGateSharded(fresh, filters).count()
    kept should be >= 195L // only bloom fp can drop fresh docs, never a join miss
    Transforms.bloomGateSharded(hist, filters).count() shouldBe 0L // history all dropped
  }

  it should "round-trip sharded filters through save/load and gate a stream" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hist = (0 until 500).map(i => (i.toLong, s"seen doc $i")).toDF("doc_id", "text")
    val batch = ((0 until 100).map(i => (1000L + i, s"seen doc $i")) ++
      (0 until 100).map(i => (2000L + i, s"new doc $i"))).toDF("doc_id", "text")
    val built = Transforms.buildBloomSharded(hist, 500L, 0.01, shards = 8).persist()
    val path = tmp() + "/history_sharded"
    Transforms.saveBloomSharded(built, path)
    val loaded = Transforms.loadBloomSharded(spark, path)
    val keptDirect = Transforms.bloomGateSharded(batch, built)
      .select("doc_id").as[Long].collect().toSet
    val keptLoaded = Transforms.bloomGateSharded(batch, loaded)
      .select("doc_id").as[Long].collect().toSet
    keptLoaded shouldBe keptDirect
    keptLoaded.count(_ < 2000L) shouldBe 0
    // stateless predicate + stream-static join: runs on a stream as-is
    val (_, df) = eventsStream(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")))
    val gated = Transforms.bloomGateSharded(
      df.withColumnRenamed("props", "text"), loaded)
    gated.isStreaming shouldBe true
    val q = gated.writeStream.format("memory").queryName("bloomed_sharded")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("bloomed_sharded").count() shouldBe 1 // "{}" not in history
  }

  it should "extend the saved history incrementally without rescanning it" in {
    import spark.implicits._
    val day1 = (0 until 500).map(i => (i.toLong, s"day one doc $i")).toDF("doc_id", "text")
    val day2 = (0 until 300).map(i => (1000L + i, s"day two doc $i")).toDF("doc_id", "text")
    val path = tmp() + "/history.bloom"
    // day 1: full build sized for the growth horizon, not today's corpus
    Transforms.saveBloom(spark, Transforms.buildBloom(day1, 2000L, 0.01), path)
    // day 2: one pass over the increment only, OR-merged into the save
    Transforms.extendBloom(spark, path, day2, 2000L, 0.01)
    val merged = Transforms.loadBloom(spark, path)
    val probe = ((0 until 500).map(i => (i.toLong, s"day one doc $i")) ++
      (0 until 300).map(i => (2000L + i, s"day two doc $i")) ++
      (0 until 300).map(i => (3000L + i, s"fresh doc $i"))).toDF("doc_id", "text")
    val kept = Transforms.bloomGate(probe, merged)
      .select("doc_id").as[Long].collect().toSet
    kept.count(_ < 500L) shouldBe 0      // day-1 history still all dropped
    kept.count(k => k >= 2000L && k < 2300L) shouldBe 0 // day-2 too (zero false neg)
    kept.count(_ >= 3000L) should be >= 290 // fresh docs survive near fpp
    // mismatched sizing params must fail loudly, not merge wrong
    an[IllegalArgumentException] should be thrownBy
      Transforms.mergeBloom(merged, Transforms.buildBloom(day2, 999L, 0.01))
  }

  it should "merge sharded filter frames pairwise with passthrough shards" in {
    import spark.implicits._
    val day1 = (0 until 400).map(i => (i.toLong, s"sharded day one $i")).toDF("doc_id", "text")
    val day2 = (0 until 200).map(i => (1000L + i, s"sharded day two $i")).toDF("doc_id", "text")
    val f1 = Transforms.buildBloomSharded(day1, 1000L, 0.01, shards = 8).persist()
    val f2 = Transforms.buildBloomSharded(day2, 1000L, 0.01, shards = 8).persist()
    val merged = Transforms.mergeBloomSharded(f1, f2).persist()
    merged.count() should be <= 8L
    val probe = ((0 until 400).map(i => (i.toLong, s"sharded day one $i")) ++
      (0 until 200).map(i => (1000L + i, s"sharded day two $i")) ++
      (0 until 200).map(i => (5000L + i, s"sharded fresh $i"))).toDF("doc_id", "text")
    val kept = Transforms.bloomGateSharded(probe, merged)
      .select("doc_id").as[Long].collect().toSet
    kept.count(_ < 2000L) shouldBe 0     // both days fully dropped
    kept.count(_ >= 5000L) should be >= 195
    // shard-count mismatch fails loudly
    val f3 = Transforms.buildBloomSharded(day2, 1000L, 0.01, shards = 16).persist()
    an[IllegalArgumentException] should be thrownBy
      Transforms.mergeBloomSharded(f1, f3)
  }

  it should "gate LSH near-duplicates of the history with zero false negatives" in {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // per-doc-unique tokens so shingles are doc-specific, not corpus-wide
    def body(tag: String, i: Int): String =
      (0 until 8).map(j => s"$tag${i}w$j").mkString(" ")
    val hist = (0 until 300).map(i => (i.toLong, body("h", i))).toDF("doc_id", "text")
    val probe = (
      (0 until 80).map(i => (1000L + i, body("h", i))) ++                  // verbatim clones
      (100 until 140).map(i => (2000L + i, body("h", i) + " changedtail")) ++ // near variants
      (0 until 200).map(i => (3000L + i, body("f", i))) :+                 // fresh
      (5000L, "two tokens")                                                // below shingle resolution
    ).toDF("doc_id", "text")
    val kept = Transforms.nearDupDedup(probe, hist, expectedDocs = 300L, fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    // ground truth band membership, via the SAME shared band-key definition
    def bands(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tk", graft.functions.TextFns.tokens(col("text")))
      .filter(org.apache.spark.sql.functions.size(col("tk")) >= 3)
      .withColumn("sig", call_function("graft_minhash",
        graft.functions.TextFns.shingles3(col("tk"))))
      .select(col("doc_id"), explode(array(
        graft.operators.Dedup.bandKeysOf(col("sig")): _*)).as("bk"))
    val gt = bands(probe).join(bands(hist).select("bk").distinct(), Seq("bk"))
      .select("doc_id").as[Long].collect().toSet
    // zero false negatives: NOTHING band-sharing with history survives
    kept.intersect(gt) shouldBe empty
    // verbatim clones share every band — all in ground truth, all dropped
    (1000L until 1080L).toSet.subsetOf(gt) shouldBe true
    // false drops confined to Bloom fp: fresh docs outside ground truth
    // survive at ~1-fpp (per-doc sizing: expected ~2 of 200 at 1%)
    val freshNotGt = (0 until 200).map(3000L + _).toSet.diff(gt)
    freshNotGt.diff(kept).size should be <= 8
    kept should contain(5000L) // sub-3-token docs pass ungated
  }

  it should "extend the near-dup band filter incrementally" in {
    import spark.implicits._
    def body(tag: String, i: Int): String =
      (0 until 8).map(j => s"$tag${i}x$j").mkString(" ")
    val day1 = (0 until 200).map(i => (i.toLong, body("a", i))).toDF("doc_id", "text")
    val day2 = (0 until 150).map(i => (500L + i, body("b", i))).toDF("doc_id", "text")
    val path = tmp() + "/neardup.bloom"
    Transforms.saveBloom(spark,
      Transforms.buildNearDupBloom(day1, 1000L, 0.01), path)
    Transforms.extendNearDupBloom(spark, path, day2, 1000L, 0.01)
    val probe = ((0 until 200).map(i => (i.toLong, body("a", i))) ++
      (0 until 150).map(i => (500L + i, body("b", i))) ++
      (0 until 150).map(i => (9000L + i, body("z", i)))).toDF("doc_id", "text")
    val kept = Transforms.nearDupGate(probe, Transforms.loadBloom(spark, path))
      .select("doc_id").as[Long].collect().toSet
    kept.count(_ < 1000L) shouldBe 0       // both days' docs dropped
    kept.count(_ >= 9000L) should be >= 140 // fresh survive near fpp
  }

  it should "report saturation honestly on under- and over-full filters" in {
    import spark.implicits._
    val docs = (0 until 500).map(i => (i.toLong, s"sat doc $i")).toDF("doc_id", "text")
    val healthy = Transforms.bloomSaturation(
      Transforms.buildBloom(docs, 2000L, 0.01), 2000L, 0.01)
    // bit-density inversion should land near the true 500 insertions
    healthy.estimatedItems.toDouble shouldBe 500.0 +- 75.0
    healthy.fillRatio shouldBe 0.25 +- 0.04
    healthy.projectedFpp should be < 0.01 // under-full runs BETTER than sized
    healthy.rebuildRecommended shouldBe false
    // 4x past the horizon: the fp guarantee is gone and the report says so
    val big = (0 until 4000).map(i => (i.toLong, s"sat doc $i")).toDF("doc_id", "text")
    val outgrown = Transforms.bloomSaturation(
      Transforms.buildBloom(big, 1000L, 0.01), 1000L, 0.01)
    outgrown.fillRatio should be > 2.0
    outgrown.projectedFpp should be > 0.01
    outgrown.rebuildRecommended shouldBe true
  }

  it should "flag outgrown shards in the sharded saturation report" in {
    import spark.implicits._
    val docs = (0 until 600).map(i => (i.toLong, s"shard sat $i")).toDF("doc_id", "text")
    val healthy = Transforms.bloomSaturationSharded(
      Transforms.buildBloomSharded(docs, 2000L, 0.01, shards = 8).persist(), 2000L, 0.01)
      .collect()
    healthy.length should be <= 8
    all(healthy.map(_.getAs[Boolean]("rebuild_recommended"))) shouldBe false
    // content-hash sharding spreads the fill: per-shard estimates sum near n
    healthy.map(_.getAs[Long]("estimated_items")).sum.toDouble shouldBe 600.0 +- 90.0
    val outgrown = Transforms.bloomSaturationSharded(
      Transforms.buildBloomSharded(docs, 100L, 0.01, shards = 8).persist(), 100L, 0.01)
      .collect()
    all(outgrown.map(_.getAs[Boolean]("rebuild_recommended"))) shouldBe true
  }

  it should "probe identically through the interpreted and codegen paths" in {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.functions.{call_function, col, lit}
    val filter = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 50L).foreach(filter.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    val bytes = bos.toByteArray
    val hashes = (0L until 100L).toSeq
    val interpreted = hashes.map { h =>
      graft.functions.ShardedBloomProbe(
        Literal(0), Literal(bytes), Literal(h)).eval(null).asInstanceOf[Boolean]
    }
    graft.plans.GraftFunctions.register(spark)
    val viaCodegen = hashes.toDF("h")
      .select(call_function("graft_bloom_probe",
        lit(0), lit(bytes), col("h")).as("m"))
      .as[Boolean].collect().toSeq
    viaCodegen shouldBe interpreted
    interpreted.take(50).forall(identity) shouldBe true // inserted keys always hit
    // null filter / null hash answer false, never null (the join-miss contract)
    graft.functions.ShardedBloomProbe(Literal(0),
      Literal.create(null, org.apache.spark.sql.types.BinaryType),
      Literal(1L)).eval(null) shouldBe false
  }

  it should "advance the funnel once per user and hold the done flag across batches" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),    // click before any view: ignored
      Ev(1, ts(2), 1, "view", 1.0, "{}"),
      Ev(2, ts(3), 1, "click", 1.0, "{}"),
      Ev(3, ts(1), 2, "purchase", 1.0, "{}"))) // purchase without stages: ignored
    val q = Transforms.funnelConversions(spark, df)
      .writeStream.format("memory").queryName("fc").outputMode("append").start()
    q.processAllAvailable()
    spark.table("fc").count() shouldBe 0 // user 1 has not purchased yet
    ms.addData(Ev(4, ts(10), 1, "purchase", 1.0, "{}"))
    q.processAllAvailable()
    val conv = spark.table("fc").collect()
    conv.map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(4))).toSeq shouldBe
      Seq((1L, ts(2), 8 * 60.0)) // view :02 → purchase :10, stage times from state
    // a later purchase must not re-emit: the done flag makes emission idempotent
    ms.addData(Ev(5, ts(11), 1, "purchase", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    spark.table("fc").count() shouldBe 1
  }

  it should "emit funnel conversions in parity with the batch funnel census" in {
    import org.apache.spark.sql.functions._
    // per-user in-order delivery (one sorted batch): the online tracker's
    // contract says it then matches the batch census exactly
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = Transforms.funnelConversions(spark, EventSource.fileStream(spark, src, 64))
      .writeStream.format("memory").queryName("fc_parity").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val conv = spark.table("fc_parity").collect()
    val expected = graft.operators.Joins.evFunnel(spark, sf)
      .collect()(0).getAs[Long]("n_purchased_after")
    conv.length.toLong shouldBe expected
    conv.map(_.getLong(0)).distinct.length shouldBe conv.length // one emission per user
    conv.foreach { r => // stage order invariant
      r.getTimestamp(1).getTime should be <= r.getTimestamp(2).getTime
      r.getTimestamp(2).getTime should be <= r.getTimestamp(3).getTime
    }
  }

  it should "roll the path tail across batches and emit triples incrementally" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "view", 1.0, "{}"),
      Ev(1, ts(2), 1, "click", 1.0, "{}")))
    val q = Transforms.pathTriples(spark, df)
      .writeStream.format("memory").queryName("paths").outputMode("append").start()
    q.processAllAvailable()
    spark.table("paths").count() shouldBe 0 // tail not full yet
    ms.addData(Ev(2, ts(3), 1, "purchase", 1.0, "{}"), Ev(3, ts(4), 1, "view", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    // state carried the (view, click) tail into the second batch
    spark.table("paths").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted shouldBe
      Seq((1L, "click>purchase>view"), (1L, "view>click>purchase"))
  }

  it should "emit path triples in parity with the batch ev_top_paths census" in {
    import org.apache.spark.sql.functions._
    // per-user in-order delivery (one sorted batch): the online emitter's
    // contract says its triple counts then match the batch window exactly
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = Transforms.pathTriples(spark, EventSource.fileStream(spark, src, 64))
      .writeStream.format("memory").queryName("paths_parity").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("paths_parity")
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.EventAnalytics.evTopPaths(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the batch op is the top-25 of the same census: every batch row must
    // match the streamed count exactly
    batch.foreach { case (p, n) => streamed.get(p) shouldBe Some(n) }
    batch.values.max shouldBe streamed.values.max // the global head agrees
  }

  it should "score streamed documents in parity with the batch surprisal op" in {
    // the streaming quality gate must agree with ta_surprisal when the
    // literal LM is the same corpus unigram table the batch op derives
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val lm = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy(col("t")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal = lm.values.sum
    val src = tmp()
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = Transforms.surprisalScore(stream, lm, nTotal)
      .select(col("doc_id"), col("avg_nll"), col("keep"))
      .writeStream.format("memory").queryName("surprisal").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("surprisal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = graft.operators.TextAnalysis.taSurprisal(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    streamed.keySet shouldBe batch.keySet
    // stream folds per token in doc order, batch sums decimal per distinct
    // term — same value up to double-fold associativity, so compare with
    // a tolerance rather than bit-equality
    streamed.foreach { case (id, nll) => nll shouldBe batch(id) +- 1e-5 }
    // every doc scores under the default ceiling on this corpus
    spark.table("surprisal").filter(!col("keep")).count() shouldBe 0L
    // and a frozen tiny LM prices OOV mass instead of crashing: score a
    // doc whose tokens are all out-of-vocabulary
    import spark.implicits._
    val oov = Transforms.surprisalScore(
      Seq((1L, "zzz qqq")).toDF("doc_id", "text"), Map("a" -> 5L), 10L)
      .collect()(0)
    oov.getAs[Double]("avg_nll") shouldBe math.log(10.0) +- 1e-6 // -ln(1/10), 6-dp rounded
  }

  it should "score streamed documents in parity with the batch DSIR op" in {
    // the streaming gate must agree with ta_dsir when the frozen
    // log-ratio table is the same one the batch op trains
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val B = graft.operators.TextCorpus.DsirBuckets
    def toks(t: String): Array[String] = t.split("\\s+").filter(_.nonEmpty)
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % B
    }
    def feats(tk: Array[String]): Array[Long] =
      (tk ++ tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))).map(bucket)
    val corpus = docs.filter("text is not null and source is not null").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        toks(r.getAs[String]("text")))).filter(_._3.nonEmpty)
    val target = corpus.map(_._2).min
    val tCnt = corpus.filter(_._2 == target).flatMap(d => feats(d._3))
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val rCnt = corpus.filter(_._2 != target).flatMap(d => feats(d._3))
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val (tn, rn) = (tCnt.values.sum, rCnt.values.sum)
    val ratio: Map[Long, Double] = rCnt.keysIterator.map { b =>
      b -> math.log(((tCnt.getOrElse(b, 0L) + 1).toDouble / (tn + B)) /
        ((rCnt(b) + 1).toDouble / (rn + B)))
    }.toMap
    val src = tmp()
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = Transforms.dsirScore(stream, ratio)
      .select(col("doc_id"), col("logw"), col("logw_per_feat"), col("keep"))
      .writeStream.format("memory").queryName("dsir").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dsir").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val batch = graft.operators.TextCorpus.taDsir(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    // every RAW doc the batch op scores agrees through the stream (the
    // stream also scores target docs — they have no batch twin)
    batch.foreach { case (id, lw) =>
      withClue(s"doc $id: ") { streamed(id)._1 shouldBe lw +- 2e-5 }
    }
    // the keep gate is exactly the per-feature sign at the default 0.0
    streamed.values.foreach { case (_, perFeat, keep) =>
      keep shouldBe (perFeat >= 0.0)
    }
    // an unseen-vocabulary doc scores neutral 0, not an error
    import spark.implicits._
    val oov = Transforms.dsirScore(
      Seq((1L, "zzzqz qqzxv")).toDF("doc_id", "text"), Map.empty[Long, Double])
      .collect()(0)
    oov.getAs[Double]("logw") shouldBe 0.0
    oov.getAs[Long]("n_feats") shouldBe 3L
  }

  it should "score streamed documents in parity with the batch quality classifier" in {
    // the online gate must agree with ql_score when the frozen weight
    // table is the one the batch op trains (round 13 — the dsirScore
    // split for the discriminative classifier)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val weights = graft.operators.QualityClassifier.trainedWeights(spark, sf)
    weights.nonEmpty shouldBe true
    val docs = graft.Tables.documents(spark, sf)
    val src = tmp()
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = Transforms.qlScore(stream, weights)
      .select(col("doc_id"), col("score"), col("prob"), col("keep"))
      .writeStream.format("memory").queryName("qlscore").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("qlscore").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val batch = graft.operators.QualityClassifier.qlScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Double]("prob"), r.getAs[Long]("keep")))).toMap
    // every doc the batch op scores agrees through the stream (stream
    // folds doubles in occurrence order, batch folds decimal per
    // occurrence — tolerance, not bit-equality; the dsirScore idiom)
    batch.foreach { case (id, (sc, pr, kp)) =>
      withClue(s"doc $id: ") {
        streamed(id)._1 shouldBe sc +- 2e-5
        streamed(id)._2 shouldBe pr +- 2e-5
        streamed(id)._3 shouldBe (kp == 1L)
      }
    }
    // an unseen-vocabulary doc scores neutral 0 / prob 0.5, not an error
    import spark.implicits._
    val oov = Transforms.qlScore(
      Seq((1L, "zzzqz qqzxv")).toDF("doc_id", "text"), Map.empty[Long, Double])
      .collect()(0)
    oov.getAs[Double]("score") shouldBe 0.0
    oov.getAs[Double]("prob") shouldBe 0.5
    oov.getAs[Boolean]("keep") shouldBe true
    oov.getAs[Long]("n_feats") shouldBe 3L
  }

  it should "score streamed documents bit-identically to batch BM25 under frozen stats" in {
    // the standing-query scorer must agree with ir_bm25 EXACTLY (not
    // within tolerance): both sides run the same IEEE op sequence per
    // term and the same decimal(38,18) sum route (round 14 — the
    // dsirScore split for retrieval)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val (n, avgdl, queries, dfm) =
      graft.operators.Retrieval.frozenStats(spark, sf)
    queries.nonEmpty shouldBe true
    val docs = graft.Tables.documents(spark, sf)
    val src = tmp()
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = Transforms.bm25Score(stream, queries, dfm, n, avgdl)
      .select(col("query_id"), col("doc_id"), col("n_terms"), col("score"))
      .writeStream.format("memory").queryName("bm25").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val batch = graft.operators.Retrieval.irBm25(spark, sf).collect()
    batch.length should be > 0
    batch.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      withClue(s"pair $key: ") {
        val (nt, sc) = streamed(key)
        nt shouldBe r.getAs[Long]("n_terms")
        sc shouldBe r.getAs[Double]("score") // EXACT, by construction
      }
    }
    // a doc matching no standing query emits nothing (router semantics);
    // an unknown term scores against df = 0, it does not error
    import spark.implicits._
    Transforms.bm25Score(Seq((1L, "no match here")).toDF("doc_id", "text"),
      Map(7L -> Seq("needle")), Map.empty, 100L, 10.0)
      .collect().length shouldBe 0
    val hit = Transforms.bm25Score(Seq((2L, "a needle")).toDF("doc_id", "text"),
      Map(7L -> Seq("needle")), Map.empty, 100L, 10.0).collect()
    hit.length shouldBe 1
    hit(0).getAs[Long]("query_id") shouldBe 7L
    hit(0).getAs[Double]("score") should be > 0.0
    // an EMPTY standing-query registry scores nothing but keeps the
    // contract schema (the degenerate branch — e.g. frozen stats over
    // an empty corpus)
    val none = Transforms.bm25Score(
      Seq((3L, "text")).toDF("doc_id", "text"),
      Map.empty[Long, Seq[String]], Map.empty, 0L, 0.0)
    none.columns should contain allOf ("query_id", "n_terms", "score")
    none.collect().length shouldBe 0
  }

  it should "score and gate identically through the token-keyed registry forms, up to 1k queries" in {
    // round 15 (r14 verdict item 6): the indexed forms must be
    // DROP-IN — exact row-set equality with the scan forms, on the
    // audit-budget registry AND a 1,000-entry synthetic registry (the
    // scale the indexed form exists for)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    def bm25Rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("query_id"), col("n_terms"), col("score"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val (n, avgdl, queries, dfm) =
      graft.operators.Retrieval.frozenStats(spark, sf)
    bm25Rows(Transforms.bm25ScoreIndexed(docs, queries, dfm, n, avgdl)) shouldBe
      bm25Rows(Transforms.bm25Score(docs, queries, dfm, n, avgdl))
    // 1k-query registry drawn from the corpus's own vocabulary (seeded)
    // mid-tail vocabulary: the selective-registry production shape the
    // indexed form contracts for (a head-token registry matches every
    // doc against every query — a shape neither form is meant for)
    val allVocab = docs.filter(col("text").isNotNull)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(4000)
      .collect().map(_.getString(0))
    val vocab = allVocab.drop(allVocab.length / 2)
    val rng = new scala.util.Random(42)
    val reg1k = (0 until 1000).map(q =>
      q.toLong -> Seq.fill(4)(vocab(rng.nextInt(vocab.length))).distinct).toMap
    val df1k = reg1k.values.flatten.toSeq.distinct
      .map(t => t -> dfm.getOrElse(t, 3L)).toMap
    val small = docs.limit(50) // plan size dominates the scan form here
    bm25Rows(Transforms.bm25ScoreIndexed(small, reg1k, df1k, n, avgdl)) shouldBe
      bm25Rows(Transforms.bm25Score(small, reg1k, df1k, n, avgdl))
    // phrase gate: audit registry, then 1k phrases cut from real docs
    def gateRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("matched_phrases"), col("contaminated"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getBoolean(2)))
      .toSet
    val phrases = graft.operators.Retrieval.frozenPhrases(spark, sf)
    phrases.nonEmpty shouldBe true
    gateRows(Transforms.phraseGateIndexed(docs, phrases)) shouldBe
      gateRows(Transforms.phraseGate(docs, phrases))
    val dtk = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("tk"))
      .filter(org.apache.spark.sql.functions.size(col("tk")) >= 5)
      .limit(200).collect()
      .map(r => r.getSeq[String](1))
    val rng2 = new scala.util.Random(7)
    val ph1k = (0 until 1000).map { p =>
      val tk = dtk(rng2.nextInt(dtk.length))
      val s = rng2.nextInt(tk.length - 2)
      p.toLong -> tk.slice(s, s + 3).toSeq
    }.toMap
    gateRows(Transforms.phraseGateIndexed(small, ph1k)) shouldBe
      gateRows(Transforms.phraseGate(small, ph1k))
    // empty-registry degenerate branches agree too
    Transforms.bm25ScoreIndexed(small, Map.empty, Map.empty, 0L, 0.0)
      .collect().length shouldBe 0
    gateRows(Transforms.phraseGateIndexed(small, Map.empty)) shouldBe
      gateRows(Transforms.phraseGate(small, Map.empty))
  }

  it should "route streamed vectors to the exact cells the batch build assigns" in {
    // the ingest router must agree with the batch index build under the
    // same frozen codebook (round 13 — one assignBook + one kernel, so
    // this pins the whole frozen-book plumbing, not just the rule)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val (sb, cb, p) = graft.operators.Similarity.frozenCodebook(spark, sf)
    cb.nonEmpty shouldBe true
    val emb = graft.Tables.embeddings(spark, sf)
    val src = tmp()
    emb.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(emb.schema).parquet(src)
    val q = Transforms.ivfRoute(stream, sb, cb, p)
      .select(col("vec_id"), col("cell"), col("routed"))
      .writeStream.format("memory").queryName("ivfroute").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ivfroute").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // batch truth through the shared private assignment path
    val v = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
    val k = graft.operators.Similarity.sqrtCells(
      graft.operators.Similarity.corpusCount(spark, sf))
    val cents = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
    val batch = graft.operators.Similarity
      .assignCells(v, cents, k, twoLevel = true, carry = Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    batch.nonEmpty shouldBe true
    batch.foreach { case (id, cell) =>
      withClue(s"vec $id: ") { streamed(id) shouldBe ((cell, true)) }
    }
    // unroutable rows QUARANTINE (routed=false), never drop: a null
    // embedding, and any vector against an EMPTY codebook
    import spark.implicits._
    val nullRow = Transforms.ivfRoute(
      Seq((1L, Option.empty[Array[Float]])).toDF("vec_id", "embedding"), sb, cb, p)
      .collect()(0)
    nullRow.getAs[Boolean]("routed") shouldBe false
    val emptyBook = Transforms.ivfRoute(
      Seq((2L, Option(Array.fill(64)(0.5f)))).toDF("vec_id", "embedding"),
      Array.empty[Double], Array.empty[Double], 0)
      .collect()(0)
    emptyBook.getAs[Long]("cell") shouldBe -1L
    emptyBook.getAs[Boolean]("routed") shouldBe false
    // a ZERO-NORM vector (the all-zero failed-embed sentinel) must
    // quarantine too, not ride the NaN tie rule into cell 0 (r13
    // advice item 1 — the documented contract now has its own guard)
    val zeroNorm = Transforms.ivfRoute(
      Seq((3L, Option(Array.fill(64)(0.0f)))).toDF("vec_id", "embedding"), sb, cb, p)
      .collect()(0)
    zeroNorm.getAs[Long]("cell") shouldBe -1L
    zeroNorm.getAs[Boolean]("routed") shouldBe false
  }

  it should "serve ANN probes from a streamed cell-partitioned index equal to the batch build" in {
    // the end-to-end vector-store loop (round 14, r13 verdict item 4):
    // stream the corpus → ivfRoute under the frozen book → snapshot
    // commits partitioned by cell → a readLatest-backed probe through
    // the batch serving tail must return EXACTLY what ann_ivf_sqrt's
    // one-plan batch build returns for the same corpus and queries
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val (sb, cb, p) = graft.operators.Similarity.frozenCodebook(spark, sf)
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("seq", col("vec_id")) // ingest version (unique per key)
    val src = tmp(); val table = tmp(); val dlq = tmp(); val cp = tmp()
    // two source files → two epochs: the probe must read across commits
    emb.repartition(2).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = VectorStoreLoader.attach(stream, sb, cb, p, table, dlq, cp)
    q.awaitTermination()
    // the table is genuinely cell-partitioned on disk (path-level
    // pruning is the point of sharding a vector store by cell)
    val dataDirs = new java.io.File(s"$table/data").listFiles().filter(_.isDirectory)
    dataDirs.nonEmpty shouldBe true
    dataDirs.foreach { epoch =>
      epoch.listFiles().filter(_.isDirectory)
        .forall(_.getName.startsWith("cell=")) shouldBe true
    }
    // same query set on both sides (the fixture protocol)
    val v = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
      .filter(col("nrm") > 0)
    val qs = v.filter(col("vec_id") % 16 === 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val batch = graft.operators.Similarity.annIvfSqrtFor(v, qs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val streamed = VectorStoreLoader.probe(spark, table, cb, qs, "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    batch.nonEmpty shouldBe true
    streamed.toSeq shouldBe batch.toSeq
    // a late re-embed SUPERSEDES: stream one more epoch re-embedding an
    // existing vector with a bumped seq — the probe must serve the NEW
    // vector (readLatest semantics), not both
    val someId = v.select(min(col("vec_id"))).head().getLong(0)
    val newVec = Array.fill(64)(0.25f)
    import spark.implicits._
    Seq((someId, newVec, Long.MaxValue))
      .toDF("vec_id", "embedding", "seq")
      .write.mode("append").parquet(src)
    val q2 = VectorStoreLoader.attach(
      spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src), sb, cb, p, table, dlq, cp)
    q2.awaitTermination()
    val served = new SnapshotTableSink(table, Seq("cell"))
      .readLatest(spark, Seq("vec_id"), "seq")
      .filter(col("vec_id") === someId).collect()
    served.length shouldBe 1
    served(0).getAs[Long]("seq") shouldBe Long.MaxValue
  }

  it should "flag streamed documents containing registered phrases exactly as the batch search" in {
    // the phrase gate must agree with ir_phrase doc-for-doc: same
    // adjacency rule, same registry (round 14 — literal-string
    // decontamination's online half)
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val phrases = graft.operators.Retrieval.frozenPhrases(spark, sf)
    phrases.nonEmpty shouldBe true
    val docs = graft.Tables.documents(spark, sf)
    val src = tmp()
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = Transforms.phraseGate(stream, phrases)
      .select(col("doc_id"), col("matched_phrases"), col("contaminated"))
      .writeStream.format("memory").queryName("phrasegate")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("phrasegate").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toSet, r.getBoolean(2)))).toMap
    val expected = graft.operators.Retrieval.irPhrase(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    streamed.size.toLong shouldBe docs.count()
    streamed.foreach { case (did, (ids, cont)) =>
      withClue(s"doc $did: ") {
        ids shouldBe expected.getOrElse(did, Set.empty[Long])
        cont shouldBe expected.contains(did)
      }
    }
    // a null-text doc carries no phrase evidence and passes clean
    import spark.implicits._
    val r0 = Transforms.phraseGate(
      Seq((9L, null: String)).toDF("doc_id", "text"), phrases).collect()(0)
    r0.getAs[Boolean]("contaminated") shouldBe false
    r0.getSeq[Long](r0.fieldIndex("matched_phrases")) shouldBe empty
    // an EMPTY registry gates nothing and keeps the contract schema
    // (a zero-arg array() would be void-typed — the degenerate branch)
    val r1 = Transforms.phraseGate(
      Seq((1L, "any text here")).toDF("doc_id", "text"),
      Map.empty[Long, Seq[String]]).collect()(0)
    r1.getAs[Boolean]("contaminated") shouldBe false
    r1.getSeq[Long](r1.fieldIndex("matched_phrases")) shouldBe empty
  }

  it should "split streamed documents into quarantine and clean exactly as the batch scorer" in {
    // the end-to-end standing-query loader (round 14): stream the corpus
    // → bm25Score under frozen stats → two-way snapshot split; the
    // quarantine table must hold EXACTLY the (query, doc) pairs the
    // batch scorer puts at or above τ, the clean table exactly the
    // complement by doc_id — a partition, nothing lost, nothing doubled
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val (n, avgdl, queries, dfm) =
      graft.operators.Retrieval.frozenStats(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    val batchScores = Transforms.bm25Score(docs, queries, dfm, n, avgdl)
      .select(col("query_id"), col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    batchScores.length should be > 0
    // τ at the match-score median: real subsets on both sides
    val tau = batchScores.map(_._3).sorted.apply(batchScores.length / 2)
    val expQuar = batchScores.filter(_._3 >= tau).map(t => (t._1, t._2)).toSet
    val expScore = batchScores.map(t => (t._1, t._2) -> t._3).toMap
    val expHitDocs = expQuar.map(_._2)
    expQuar.nonEmpty shouldBe true
    (batchScores.length - expQuar.size) should be > 0
    val src = tmp(); val clean = tmp(); val quar = tmp(); val cp = tmp()
    // two source files → two epochs: the split must hold across commits
    docs.repartition(2).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StandingQueryLoader.attach(stream, queries, dfm, n, avgdl, tau,
      clean, quar, cp)
    q.awaitTermination()
    val gotQuar = new SnapshotTableSink(quar, Seq("query_id")).read(spark)
      .select(col("query_id"), col("doc_id"), col("score")).collect()
      // getAs[Long] directly: the sink's PART_TYPES sidecar (round 15)
      // restores the written BIGINT through partition discovery — this
      // read IS the round-trip pin
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score")))
    gotQuar.map(t => (t._1, t._2)).toSet shouldBe expQuar
    gotQuar.length shouldBe expQuar.size // once per matching query, ever
    gotQuar.foreach { case (qid, did, sc) =>
      withClue(s"pair ($qid, $did): ") { sc shouldBe expScore((qid, did)) }
    }
    // quarantine table is genuinely query_id-partitioned on disk
    val dataDirs = new java.io.File(s"$quar/data").listFiles().filter(_.isDirectory)
    dataDirs.nonEmpty shouldBe true
    dataDirs.foreach { epoch =>
      epoch.listFiles().filter(_.isDirectory)
        .forall(_.getName.startsWith("query_id=")) shouldBe true
    }
    // the reviewer's queue reads one query's pairs only
    val someQ = expQuar.head._1
    StandingQueryLoader.reviewQueue(spark, quar, someQ).collect()
      .map(_.getAs[Long]("doc_id")).toSet shouldBe
      expQuar.filter(_._1 == someQ).map(_._2)
    // conservation: clean ⊎ quarantined-doc-ids = the corpus, disjoint
    val allDocs = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val gotClean = StandingQueryLoader.cleanCorpus(spark, clean)
      .select("doc_id").collect().map(_.getLong(0))
    gotClean.length shouldBe gotClean.toSet.size
    gotClean.toSet.intersect(expHitDocs) shouldBe Set.empty
    (gotClean.toSet ++ expHitDocs) shouldBe allDocs
  }

  it should "alert once on metronomic users and never on bursty ones" in {
    // the online half of the regularity pair: a 600 s metronome must
    // alert exactly when its 9th gap lands (cv 0), a bursty user with
    // the same volume must not, and further metronome traffic in a
    // later microbatch must NOT re-alert (the once-per-user latch)
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new Timestamp(base.getTime + sec * 1000)
    val bursty = Seq(1L, 2, 3, 4, 100, 101, 102, 5000, 5001, 9000, 9001, 12000)
    val first =
      (0 until 10).map(i => Ev(200L + i, at(600L * i), 2L, "view", 1.0, "{}")) ++
        bursty.zipWithIndex.map { case (t, i) => Ev(100L + i, at(t), 1L, "view", 1.0, "{}") }
    val (ms, df) = eventsStream(first)
    val cp = tmp()
    val q = Transforms.botAlerts(spark, df)
      .writeStream.format("memory").queryName("botalerts")
      .option("checkpointLocation", cp).outputMode("append").start()
    q.processAllAvailable()
    val alerts1 = spark.table("botalerts").collect()
    alerts1.length shouldBe 1
    alerts1(0).getAs[Long]("user_id") shouldBe 2L
    alerts1(0).getAs[Long]("n_gaps") shouldBe 9L
    alerts1(0).getAs[Double]("cv_gap") shouldBe 0.0
    alerts1(0).getAs[Double]("mean_gap_s") shouldBe 600.0
    // more metronome traffic: still bot-regular, but the latch holds
    ms.addData((10 until 14).map(i => Ev(300L + i, at(600L * i), 2L, "view", 1.0, "{}")): _*)
    q.processAllAvailable(); q.stop()
    spark.table("botalerts").count() shouldBe 1
  }

  it should "fan out one source to independently-committed sinks" in {
    // PartitionGroupingSink analog: two sinks, separate checkpoints,
    // each commits its own progress over the same source.
    import spark.implicits._
    val src = tmp()
    Seq(Ev(0, ts(1), 1, "click", 1.0, "{}"), Ev(1, ts(2), 2, "view", 2.0, "{}"))
      .toDF().write.mode("overwrite").parquet(src)
    val outA = tmp(); val outB = tmp()
    Sinks.recordBatchingSink(EventSource.fileStream(spark, src), outA, tmp())
      .start().awaitTermination()
    Sinks.recordBatchingSink(EventSource.fileStream(spark, src), outB, tmp(),
      format = "json").start().awaitTermination()
    spark.read.parquet(outA).count() shouldBe 2
    spark.read.schema(EventSource.schema).json(outB).count() shouldBe 2
  }

  it should "join two streams on key within an event-time interval" in {
    import org.apache.spark.sql.functions.col
    val (_, df) = eventsStream(Seq(
      Ev(0, ts(0), 1, "view", 1.0, "{}"),
      Ev(1, ts(5), 1, "click", 1.0, "{}"),   // view 0 is 5 min before → match
      Ev(2, ts(30), 1, "click", 1.0, "{}"),  // nearest view 30 min back → no match
      Ev(3, ts(8), 2, "click", 1.0, "{}")))  // user 2 never viewed → no match
    val q = Transforms.clickViewJoin(
        df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "view"))
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssjoin").collect()
    rows.map(r => (r.getLong(1), r.getLong(3))).toSet shouldBe Set((1L, 0L)) // (click_id, view_id)
  }

  it should "enrich a stream against a broadcast static dimension" in {
    import spark.implicits._
    val (_, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 2, "view", 2.0, "{}")))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = Transforms.enrich(df, dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("enriched").select("user_id", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe Set((1L, "gold"), (2L, "silver"))
  }

  it should "keep running user totals via mapGroupsWithState" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 1, "view", 2.0, "{}"),
      Ev(2, ts(3), 2, "click", 5.0, "{}")))
    val q = Transforms.runningUserTotals(spark, df)
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    q.processAllAvailable()
    ms.addData(Ev(3, ts(4), 1, "click", 4.0, "{}"))
    q.processAllAvailable(); q.stop()
    val last = spark.table("totals").collect()
      .filter(_.getLong(0) == 1L).maxBy(_.getLong(1))
    last.getLong(1) shouldBe 3
    last.getDouble(2) shouldBe 7.0
  }

  it should "flag streamed outliers against pre-fold Welford moments" in {
    // 40 tight values (alternating 9.9/10.1 around mean 10, sd 0.1)
    // establish the distribution; minN=30 suppresses the cold start
    val warm = (0 until 40).map(i =>
      Ev(i.toLong, ts(i + 1), 1, "click", if (i % 2 == 0) 9.9 else 10.1, "{}"))
    val (ms, df) = eventsStream(warm)
    val q = Transforms.anomalyAlerts(spark, df, minN = 30L, zThresh = 4.0)
      .writeStream.format("memory").queryName("alerts").outputMode("append").start()
    q.processAllAvailable()
    // nothing in the warmup is ever 4 sd out, and events before minN
    // (including the warmup's own first rows) must not alert
    spark.table("alerts").count() shouldBe 0
    // next batch: one gross outlier and one in-distribution value; the
    // moments must have carried across the microbatch boundary
    ms.addData(
      Ev(40, ts(41), 1, "click", 100.0, "{}"),
      Ev(41, ts(42), 1, "click", 10.0, "{}"))
    q.processAllAvailable()
    // a later normal value must still use stats NOT poisoned into
    // silence by the outlier... but the outlier did fold in, widening
    // sd; a second identical outlier right after is then only ~2.5 sd
    // out — assert the first alert fired with the pre-fold moments
    val alerts = spark.table("alerts").collect()
    alerts.map(_.getLong(1)).toSeq shouldBe Seq(40L)
    val a = alerts.head
    a.getString(0) shouldBe "click"
    a.getDouble(2) shouldBe 100.0
    a.getLong(4) shouldBe 40L           // scored against all 40 warm events
    a.getDouble(3) should be > 100.0    // (100-10)/0.1 = 900 sd
    q.stop()
  }

  it should "evict idle users after the event-time TTL with a final total" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(2), 1, "view", 2.0, "{}")))
    // watermark 1 min, idle TTL 5 min: user 1's last event is at :02, so
    // the deadline is :07 of EVENT time regardless of batching
    val q = Transforms.runningUserTotalsWithTtl(spark, df,
        watermark = "1 minute", idleMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("ttl_totals").outputMode("append").start()
    q.processAllAvailable()
    spark.table("ttl_totals").count() shouldBe 0 // still inside the idle horizon
    // a LATE in-watermark arrival (:01:30, older than last-seen :02) must
    // extend the total but never SHRINK the :07 deadline
    ms.addData(Ev(2, Timestamp.valueOf("2024-01-01 00:01:30"), 1, "click", 1.5, "{}"))
    q.processAllAvailable()
    // watermark → :06:45: a deadline wrongly derived from the late batch
    // alone (:01:30 + 5 = :06:30) would flush here; the true deadline :07
    ms.addData(Ev(3, Timestamp.valueOf("2024-01-01 00:07:45"), 2, "click", 9.0, "{}"))
    q.processAllAvailable()
    spark.table("ttl_totals").count() shouldBe 0
    ms.addData(Ev(4, ts(20), 2, "click", 9.0, "{}")) // watermark → :19
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ttl_totals").collect()
    // user 1 flushed ONCE with the complete total incl. the late event;
    // user 2's last event (:20) keeps it active past watermark :19
    rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet shouldBe
      Set((1L, 3L, 4.5))
  }

  behavior of "Transforms.throttledEvents"

  it should "pass exactly the batch throttle's kept set on in-order delivery" in {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val cap = graft.operators.EventAnalytics.ThrottleCap
    val q = Transforms.throttledEvents(spark, EventSource.fileStream(spark, src, 64), cap)
      .writeStream.format("memory").queryName("throttled").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("throttled").select("event_id").collect()
      .map(_.getLong(0)).toSet
    // batch census of the SAME keep rule: row_number ≤ cap per (user, hour)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val batchKept = graft.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
      .select("event_id").collect().map(_.getLong(0)).toSet
    streamed shouldBe batchKept
    // and the per-type totals agree with the ev_throttle report
    val perType = spark.table("throttled").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.operators.EventAnalytics.evThrottle(spark, sf).collect().foreach { r =>
      perType.getOrElse(r.getAs[String]("event_type"), 0L) shouldBe r.getAs[Long]("n_kept")
    }
  }

  it should "cap a burst across microbatches with one counter per (user, hour)" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "view", 1.0, "{}"),
      Ev(1, ts(2), 1, "view", 1.0, "{}")))
    val q = Transforms.throttledEvents(spark, df, cap = 2)
      .writeStream.format("memory").queryName("throttle_roll").outputMode("append").start()
    q.processAllAvailable()
    spark.table("throttle_roll").count() shouldBe 2
    // same hour, later batch: counter state says the cap is already spent
    ms.addData(Ev(2, ts(3), 1, "view", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    spark.table("throttle_roll").count() shouldBe 2
  }

  it should "evict cold (user, hour) counters once the watermark clears the hour" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "view", 1.0, "{}"),
      Ev(1, ts(2), 1, "view", 1.0, "{}")))
    val q = Transforms.throttledEvents(spark, df, cap = 2, watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("throttle_ttl").outputMode("append").start()
    q.processAllAvailable()
    // 3.5 h later: watermark (3:30 − 1 min) clears hour 0's end, so the
    // (user 1, hour 0) counter times out; only (user 2, hour 3) survives
    ms.addData(Ev(2, Timestamp.valueOf("2024-01-01 03:30:00"), 2, "view", 1.0, "{}"))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    stateRows shouldBe 1L
    spark.table("throttle_ttl").count() shouldBe 3 // eviction emits nothing
  }

  it should "drop an idle user's tail (and restart the path) under the TTL variant" in {
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "view", 1.0, "{}"),
      Ev(1, ts(2), 1, "click", 1.0, "{}"))) // tail = (view, click)
    val q = Transforms.pathTriplesWithTtl(spark, df,
        watermark = "1 minute", idleMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("paths_ttl").outputMode("append").start()
    q.processAllAvailable()
    ms.addData(Ev(2, ts(30), 2, "view", 1.0, "{}")) // watermark → :29 ⇒ user 1 evicted
    q.processAllAvailable()
    // user 1 resurfaces: the exact twin would emit view>click>purchase
    // here — the TTL variant must have forgotten the tail
    ms.addData(Ev(3, ts(31), 1, "purchase", 1.0, "{}"))
    q.processAllAvailable()
    spark.table("paths_ttl").count() shouldBe 0
    // tail rebuilds from scratch: first triple is purchase>view>click
    ms.addData(Ev(4, ts(32), 1, "view", 1.0, "{}"), Ev(5, ts(33), 1, "click", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    spark.table("paths_ttl").collect().map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      Set((1L, "purchase>view>click"))
  }

  behavior of "Transforms.lastTouchAttribution"

  it should "credit purchases in parity with the batch ev_attribution census" in {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = Transforms.lastTouchAttribution(spark, EventSource.fileStream(spark, src, 64))
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attrib").groupBy("touch_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.EventValue.evAttribution(spark, sf).collect()
      .map(r => r.getAs[String]("touch_type") -> r.getAs[Long]("n_purchases")).toMap
    streamed shouldBe batch
  }

  behavior of "Transforms.newUserEvents"

  it should "emit each user's first event once, in parity with the batch growth curve" in {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val src = tmp()
    graft.Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = Transforms.newUserEvents(spark, EventSource.fileStream(spark, src, 64))
      .writeStream.format("memory").queryName("newusers").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val hits = spark.table("newusers").collect()
    // exactly one hit per distinct user
    hits.map(_.getLong(0)).distinct.length shouldBe hits.length
    hits.length.toLong shouldBe graft.Tables.events(spark, sf)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    // per-day counts match the batch operator
    val streamed = hits.groupBy(_.getLong(2)).view.mapValues(_.length.toLong).toMap
    graft.operators.EventValue.evCumulativeUsers(spark, sf).collect().foreach { r =>
      val day = r.getTimestamp(0).toInstant.getEpochSecond / 86400
      streamed.getOrElse(day, 0L) shouldBe r.getAs[Long]("n_new_users")
    }
  }

  it should "stay silent for a user already seen in an earlier batch" in {
    val (ms, df) = eventsStream(Seq(Ev(0, ts(1), 1, "view", 1.0, "{}")))
    val q = Transforms.newUserEvents(spark, df)
      .writeStream.format("memory").queryName("newusers_roll").outputMode("append").start()
    q.processAllAvailable()
    spark.table("newusers_roll").count() shouldBe 1
    ms.addData(Ev(1, ts(2), 1, "click", 1.0, "{}"), Ev(2, ts(3), 2, "view", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    // user 1 stays silent; user 2 emits its first
    spark.table("newusers_roll").collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 0L), (2L, 2L))
  }

  it should "evict an idle user's touch once the window has passed it" in {
    val (ms, df) = eventsStream(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")))
    // 30-min attribution window, 1-min watermark delay
    val q = Transforms.lastTouchAttribution(spark, df,
        windowUs = 1800000000L, watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("attrib_ttl").outputMode("append").start()
    q.processAllAvailable()
    // watermark → :59: user 1's touch (:01) + 30 min window expired → evicted;
    // the purchase then credits "none" — identical to expired-but-kept state
    ms.addData(Ev(1, ts(60), 2, "view", 1.0, "{}"))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    ms.addData(Ev(2, ts(61), 1, "purchase", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    stateRows shouldBe 1L // only user 2's view survives the horizon
    spark.table("attrib_ttl").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet shouldBe Set((2L, "none"))
  }

  it should "re-emit a resurrected user under the TTL first-seen variant" in {
    val (ms, df) = eventsStream(Seq(Ev(0, ts(1), 1, "view", 1.0, "{}")))
    // 10-min idle horizon: user 1 evicted once watermark passes :11
    val q = Transforms.newUserEventsWithTtl(spark, df,
        watermark = "1 minute", idleMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("newusers_ttl").outputMode("append").start()
    q.processAllAvailable()
    ms.addData(Ev(1, ts(30), 2, "view", 1.0, "{}")) // watermark → :29 ⇒ evict user 1
    q.processAllAvailable()
    ms.addData(Ev(2, ts(31), 1, "view", 1.0, "{}")) // resurrection: new again
    q.processAllAvailable(); q.stop()
    spark.table("newusers_ttl").collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 0L), (2L, 1L), (1L, 2L))
  }

  it should "credit arbitrarily late purchases under watermark = None (round-5 contract)" in {
    // the TTL default trades lateness for bounded state; None must
    // restore the exact unbounded contract: every delivered purchase is
    // credited, however far behind the stream's max event time
    val (ms, df) = eventsStream(Seq(
      Ev(0, ts(1), 1, "click", 1.0, "{}"),
      Ev(1, ts(600), 2, "view", 1.0, "{}"))) // max event time 10 h in
    val q = Transforms.lastTouchAttribution(spark, df, watermark = None)
      .writeStream.format("memory").queryName("attrib_nowm").outputMode("append").start()
    q.processAllAvailable()
    // 9h59m behind the max — any default watermark would drop it
    ms.addData(Ev(2, ts(2), 1, "purchase", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    spark.table("attrib_nowm").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet shouldBe Set((2L, "click"))
  }

  it should "expire a touch outside the attribution window and carry one inside it" in {
    val (ms, df) = eventsStream(Seq(Ev(0, ts(1), 1, "click", 1.0, "{}")))
    // tight 30-minute window so the second purchase falls outside it
    val q = Transforms.lastTouchAttribution(spark, df, windowUs = 1800000000L)
      .writeStream.format("memory").queryName("attrib_win").outputMode("append").start()
    q.processAllAvailable()
    ms.addData(Ev(1, ts(10), 1, "purchase", 1.0, "{}"), // 9 min later: credited
      Ev(2, ts(50), 1, "purchase", 1.0, "{}")) // 49 min later: expired
    q.processAllAvailable(); q.stop()
    spark.table("attrib_win").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet shouldBe
      Set((1L, "click"), (2L, "none"))
  }
}
