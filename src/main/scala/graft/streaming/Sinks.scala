package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Storage sinks with the reference's delivery guarantees, re-expressed on
  * Structured Streaming's epoch model.
  *
  * References (semantics only):
  *  - RecordBatchingSink + PartitioningFileRecordBatcher + FileCommitStrategy
  *    (sink/batch/RecordBatchingSink.scala, sink/file): batch records per
  *    time partition, roll files at N records.
  *  - TwoPhaseCommitBatchStorage (sink/batch/storage/TwoPhaseCommitBatchStorage.scala):
  *    stage, then atomically commit with the consumed ranges recorded.
  *  - InDataOffsetBatchStorage (sink/batch/storage/InDataOffsetBatchStorage.scala):
  *    offsets stored inside the data; recovery = read back the max batch id.
  */
object Sinks {

  /** Partitioned file sink: routes records to `dt=yyyyMMdd` directories
    * (TimePartitioningFilePathFormatter) and rolls files at
    * `maxRecordsPerFile` (ReachedAnyOf(recordsWritten=N)). Exactly-once
    * via Spark's transactional file-sink commit log.
    *
    * `writerTasksPerPartition` > 0 shuffles each epoch by
    * `(dt, salt % writerTasksPerPartition)` before the write. Without it,
    * every input task opens a file in every date directory it touches —
    * O(tasks × dates) small files per epoch, the classic partitioned-sink
    * file explosion at cluster scale. With it, each date is written by at
    * most `writerTasksPerPartition` tasks (salting keeps a hot date from
    * serializing on one writer), bounding the epoch's file count to
    * O(dates × salt) regardless of input parallelism. */
  def recordBatchingSink(
      events: DataFrame,
      outDir: String,
      checkpointDir: String,
      maxRecordsPerFile: Long = 100000,
      format: String = "parquet",
      compression: Option[String] = None,
      writerTasksPerPartition: Int = 0): DataStreamWriter[Row] = {
    val dated = events.withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
    val routed =
      if (writerTasksPerPartition > 0)
        dated.repartition(col("dt"),
          pmod(hash(col("event_id")), lit(writerTasksPerPartition)))
      else dated
    val w = routed
      .writeStream
      // parquet | csv | json (CsvFileBuilder analogs). Avro goes through
      // GraftLoader.AvroFiles → graft.sources.AvroContainerSource instead:
      // format("avro") needs the spark-avro module, absent here, so the
      // container format is written with the core avro library directly.
      .format(format)
      .partitionBy("dt")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .trigger(Trigger.AvailableNow())
    compression.fold(w)(c => w.option("compression", c)) // Compression.ZSTD etc.
  }

  /** Multi-file commit batches under a TOTAL budget (reference:
    * sink/file/MultiFileCommitStrategy.scala `total` — commit the whole
    * multi-file batch once the summed size / record count across its
    * open files reaches the single-file condition).
    *
    * Per epoch and per partition group (`event_type`), records are
    * folded in offset order into CONSECUTIVE commit batches with the
    * reference's reset-per-commit semantics: a batch accumulates until
    * its OWN totals reach the byte/record budget (the crossing record
    * stays, like a file growing past fileSize before rolling), then the
    * counters reset for the next batch — overshoot never carries over.
    * Byte sizes are estimated from the CSV-encoded record (the reference
    * counts encoded bytes too). The fold runs as one sequential scan per
    * partition group inside `mapPartitions` — exactly the reference's
    * one-sinker-per-partition-group execution shape — after a shuffle
    * that co-locates and orders each group. Each batch lands as its own
    * `group=<g>/commit=<k>/dt=<d>` directory tree with ONE file per
    * (commit, dt) — the multi-file batch — and the whole epoch publishes
    * with a single atomic rename (exactly-once on replay, same protocol
    * as InDataOffsetSink).
    *
    * Duration limits are trigger-owned in Spark (see [[ReachedAnyOf]]);
    * configure the trigger interval for wall-clock flushing. */
  def multiFileBatchingSink(
      events: DataFrame,
      outDir: String,
      checkpointDir: String,
      strategy: MultiFileCommit.Total,
      jitter: Option[(Double, Long)] = None): DataStreamWriter[Row] = {
    val maxBytes = strategy.single.maxBytes
    val maxRecords = strategy.single.maxRecords
    require(maxBytes.nonEmpty || maxRecords.nonEmpty,
      "multiFileBatchingSink needs a byte or record budget (duration is trigger-owned)")
    jitter.foreach { case (rel, _) =>
      require(rel > 0.0 && rel < 1.0,
        s"jitter relative stdDev must be in (0, 1) (got $rel)") }
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dest = new Path(outDir, s"epoch_$epochId")
        if (!fs.exists(dest)) { // replayed epochs were already published atomically
          val line = concat_ws(",", batch.columns.map(c => col(c).cast("string")): _*)
          val sized = batch
            .withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
            .withColumn("_bytes", (octet_length(line) + lit(1)).cast("long"))
            .repartition(col("event_type"))
            .sortWithinPartitions(col("event_type"), col("event_id"))
          val outSchema = sized.schema.add("commit", org.apache.spark.sql.types.LongType)
          val groupIdx = sized.schema.fieldIndex("event_type")
          val bytesIdx = sized.schema.fieldIndex("_bytes")
          val maxB = maxBytes; val maxR = maxRecords; val jit = jitter
          val withCommit = sized.mapPartitions { it =>
            // reset-per-commit fold (MultiFileCommit.TotalFold); state
            // restarts on group change (a partition may hold several
            // hash-co-located groups). With jitter, budgets re-draw per
            // commit (FuzzyTotalFold) — replay-deterministic because the
            // RNG re-seeds from (seed, group) and the fold order is
            // pinned by the sortWithinPartitions above.
            val fold = jit match {
              case Some((rel, seed)) => Right(new MultiFileCommit.FuzzyTotalFold(
                maxB.map(b => (b, math.max(1L, math.round(b * rel)))),
                maxR.map(r => (r, math.max(1L, math.round(r * rel)))), seed))
              case None => Left(new MultiFileCommit.TotalFold(maxB, maxR))
            }
            var group: String = null
            it.map { row =>
              val g = row.getString(groupIdx)
              if (g != group) {
                group = g
                fold.fold(_.reset(), _.reset(g.##.toLong))
              }
              val commit = fold.fold(_.next(row.getLong(bytesIdx)), _.next(row.getLong(bytesIdx)))
              Row.fromSeq(row.toSeq :+ commit)
            }
          }(org.apache.spark.sql.Encoders.row(outSchema))
            .drop("_bytes")
            .withColumnRenamed("event_type", "group")
          publish(fs, outDir, s"epoch_$epochId") { staging =>
            withCommit
              .write.partitionBy("group", "commit", "dt")
              .mode("overwrite").parquet(staging.toString)
          }
        }
        ()
      }
  }

  /** Rename that FAILS LOUDLY: Hadoop `FileSystem.rename` reports most
    * failures by returning false, not throwing — at a commit point a
    * swallowed false means the epoch "succeeded", the checkpoint
    * advances, and the data silently stays in staging forever. Every
    * commit-point rename in this module goes through here so a failed
    * publish surfaces as a failed batch (which Spark retries). */
  private[streaming] def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
      from: Path, to: Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"rename failed: $from -> $to")

  /** Shared commit-point protocol: stage under `_staging/<name>` (hidden
    * from readers — Spark's file index skips underscore paths), publish
    * with ONE atomic rename, then drop the staging parent when empty
    * (non-recursive delete refuses while another epoch is mid-stage). */
  private[streaming] def publish(fs: org.apache.hadoop.fs.FileSystem, outDir: String,
      name: String)(write: Path => Unit): Unit = {
    val staging = new Path(outDir, s"_staging/$name")
    if (fs.exists(staging)) fs.delete(staging, true) // crashed half-stage
    write(staging)
    val dest = new Path(outDir, name)
    fs.mkdirs(dest.getParent)
    if (fs.exists(dest)) fs.delete(dest, true)
    renameOrThrow(fs, staging, dest) // the commit point
    try fs.delete(staging.getParent, false) catch { case _: java.io.IOException => () }
  }

  /** Small-files compaction for file sinks: rewrite a (partition of a)
    * table into ~`targetFileBytes` files and swap directories.
    * Long-running loaders accumulate per-epoch small files (the reference
    * bounds this up front via FileCommitStrategy sizes; a Spark sink
    * compacts after the fact — same end state, and the rewrite is
    * distributed). Returns the number of files after compaction.
    *
    * Crash safety: the swap is two renames (dir → .compact.old, then
    * .compact.tmp → dir), so there is a window where `dir` does not exist
    * and concurrent readers would fail. A crash inside that window is
    * repaired by [[recoverCompaction]], which every `compact` call runs
    * first — the original data is never deleted until the compacted copy
    * is in place. Run compaction from the single loader process that owns
    * the table (the reference's storages assume a single committer too).
    *
    * Scope: rename-published sink dirs and plain parquet tables. A
    * NATIVE streaming-file-sink output (recordBatchingSink) carries a
    * `_spark_metadata` commit log whose file list a rewrite would
    * invalidate — readers preferring the log would silently lose all
    * compacted history — so compact REFUSES those dirs. A partitioned
    * layout must be declared via `partitionCols` (partition-discovered
    * columns would otherwise be rewritten as flat data columns). */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil): Int = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(dir, "_spark_metadata")),
      s"$dir is a streaming file-sink table: its _spark_metadata commit log " +
        "pins the exact file list, so a compaction rewrite would make " +
        "committed history invisible to readers. Compact only rename-" +
        "published sink dirs (InDataOffset/multiFile/RowBinary) or plain tables.")
    recoverCompaction(spark, dir)
    val sizeBytes = fs.getContentSummary(new Path(dir)).getLength
    val nFiles = math.max(1, math.ceil(sizeBytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(dir + ".compact.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val w = spark.read.parquet(dir).repartition(nFiles).write
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val old = new Path(dir + ".compact.old")
    if (fs.exists(old)) fs.delete(old, true)
    renameOrThrow(fs, new Path(dir), old)
    renameOrThrow(fs, tmp, new Path(dir))
    fs.delete(old, true)
    val it = fs.listFiles(new Path(dir), true) // recursive: partitioned layouts nest
    var n = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Repair an interrupted [[compact]]: if the table dir is missing but
    * `<dir>.compact.old` survives (crash between the two swap renames),
    * restore the original; stray `.compact.tmp` staging is discarded
    * (recomputed on the next compact). Idempotent. Returns true if a
    * restore happened. */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + ".compact.old")
    val restored = if (!fs.exists(new Path(dir)) && fs.exists(old)) {
      renameOrThrow(fs, old, new Path(dir)); true
    } else false
    if (fs.exists(new Path(dir)) && fs.exists(old)) fs.delete(old, true)
    restored
  }

  /** Two-phase commit storage: every epoch is (1) staged to a temp dir,
    * (2) renamed into place, (3) committed by creating a per-epoch
    * marker file `_commits/<batchId>` carrying the consumed offset
    * ranges. A replayed epoch (restart between stage and commit) is
    * detected by its marker and skipped, giving exactly-once end-to-end
    * — the TwoPhaseCommitBatchStorage protocol on Spark's epoch ids
    * instead of Kafka offsets.
    *
    * One marker FILE per epoch, not one appended manifest line:
    * `FileSystem.append` is unsupported on ChecksumFileSystem (file://)
    * and object stores (s3a://), and an appended line torn by a crash
    * would corrupt every later parse of the shared file. A marker
    * becomes visible by one atomic create+rename, a torn tmp marker is
    * invisible to recovery (the epoch just re-delivers, idempotently),
    * and no commit ever rewrites another commit's record. A legacy
    * `_manifest` file from the append-era layout is still honored
    * read-only, tolerating a torn final line.
    *
    * @param epochGate optional pre-publish integrity gate (round 14,
    *   r13 verdict item 6): runs against the staged epoch frame BEFORE
    *   phase 2's rename — a gated defect refuses the whole epoch
    *   loudly (no data visible, no marker written; the stream fails
    *   and a restart re-delivers the epoch), closing the loop the
    *   reference's storage trait implies: a committing sink owns its
    *   epoch's integrity, not just its atomicity.
    *   [[Transforms.manifestEpochGate]] is the shard-manifest instance. */
  class TwoPhaseCommitSink(outDir: String,
      epochGate: Option[DataFrame => Option[String]] = None) extends Serializable {

    def attach(events: DataFrame, checkpointDir: String): StreamingQuery =
      events.writeStream
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(writeBatch _)
        .start()

    def committedBatchIds(spark: org.apache.spark.sql.SparkSession): Seq[Long] = {
      val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val commits = new Path(outDir, "_commits")
      val markers =
        if (!fs.exists(commits)) Seq.empty
        else fs.listStatus(commits).toSeq
          .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      val manifest = new Path(outDir, "_manifest") // legacy append-era layout
      val legacy =
        if (!fs.exists(manifest)) Seq.empty
        else {
          val in = fs.open(manifest)
          // a crash mid-append can tear the final line; an unparseable id
          // means that commit never completed — treat as uncommitted (the
          // epoch re-delivers and re-publishes idempotently)
          val lines = scala.io.Source.fromInputStream(in).getLines()
            .flatMap(l => scala.util.Try(l.split(":")(0).toLong).toOption).toList
          in.close(); lines
        }
      (markers ++ legacy).distinct
    }

    /** Idempotent epoch write (the two phases + marker commit). The
      * epoch is cached: foreachBatch re-executes the source scan for every
      * action otherwise (write + ranges + count = 3 source reads). */
    def writeBatch(batchRaw: DataFrame, batchId: Long): Unit = {
      val spark = batchRaw.sparkSession
      if (committedBatchIds(spark).contains(batchId)) return // replay → skip
      val batch = batchRaw.persist()
      // Integrity gate BEFORE phase 2: a refused epoch publishes
      // NOTHING — no visible data dir, no marker — and fails the query
      // loudly (never a silent drop; the epoch re-delivers after the
      // defect is fixed upstream)
      for (g <- epochGate; reason <- g(batch)) {
        batch.unpersist()
        throw new IllegalStateException(
          s"two-phase commit REFUSED epoch $batchId: $reason")
      }
      val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Phases 1+2: stage, then one atomic rename (shared protocol)
      publish(fs, outDir, s"batch=$batchId") { staging =>
        batch.write.mode("overwrite").parquet(staging.toString)
      }
      // Commit: marker `_commits/<id>` with `partition=min..max,...;rows=n`.
      // Range endpoints come from (event_type, event_id) when the schema
      // carries them — the sink itself is schema-agnostic (the
      // SnapshotTableSink rule), so non-event epochs (e.g. a gated
      // shard-manifest stream) commit rows-only markers
      val hasEv = batch.columns.contains("event_type") &&
        batch.columns.contains("event_id")
      val ranges =
        if (!hasEv) ""
        else batch.groupBy(col("event_type"))
          .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
          .collect()
          .sortBy(_.getString(0))
          .map(r => s"${r.getString(0)}=${r.getLong(1)}..${r.getLong(2)}")
          .mkString(",")
      val commits = new Path(outDir, "_commits")
      fs.mkdirs(commits)
      val tmpMarker = new Path(commits, s".tmp.$batchId")
      val out = fs.create(tmpMarker, true)
      out.write(s"$ranges;rows=${batch.count()}\n".getBytes("UTF-8")); out.close()
      renameOrThrow(fs, tmpMarker, new Path(commits, batchId.toString))
      batch.unpersist()
    }
  }

  /** In-data offset storage: the epoch id travels inside the data as a
    * `_batch_id` column; recovery scans the sink for the max committed
    * batch and drops replays — no external commit log needed.
    *
    * The reference's InDataOffsetBatchStorage relies on the store making
    * each batch insert transactional (Vertica COPY); a plain parquet
    * append is not (a crash mid job-commit leaves a PARTIAL epoch whose
    * max `_batch_id` would wrongly mask the retry). Here each epoch
    * becomes visible via one atomic directory rename: stage the whole
    * epoch under `_staging/<id>`, then rename to `batch_<id>`. Data that
    * is readable is therefore always a complete epoch, and a replayed or
    * half-staged epoch is simply re-written. (Directory rename is atomic
    * on HDFS/POSIX; on S3 front this with the committer's staging layer,
    * exactly as the reference does with S3MultiFileStaging.) */
  class InDataOffsetSink(outDir: String) extends Serializable {

    def attach(events: DataFrame, checkpointDir: String): StreamingQuery =
      events.writeStream
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(writeBatch _)
        .start()

    /** All committed (= atomically published) rows across epochs.
      * `mergeSchema` makes epochs written under an EVOLVED schema (a
      * producer added a column mid-stream — the reference handles this
      * with versioned record encoders) read back as one unioned schema,
      * old epochs null-filling the new columns. */
    def read(spark: org.apache.spark.sql.SparkSession): DataFrame =
      spark.read
        .option("recursiveFileLookup", "true")
        .option("mergeSchema", "true")
        .parquet(outDir)

    /** Committed rows with lookback re-deliveries collapsed: rows sharing
      * `keys` keep only their FIRST delivery (min `_batch_id`) — the
      * consumer-side dedup a rewound loader requires (the reference's
      * RewindingPartitionGroupSinker contract). */
    def readDeduped(
        spark: org.apache.spark.sql.SparkSession,
        keys: Seq[String] = Seq("event_id")): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(col("_batch_id").asc)
      read(spark)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_rn")
    }

    private def committedDirs(spark: org.apache.spark.sql.SparkSession): Seq[Path] = {
      val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(outDir))) Seq.empty
      else fs.listStatus(new Path(outDir)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
        .map(_.getPath)
    }

    /** Recovery position (the reference's `SELECT max(batch_id)`). A
      * `batch_<id>` dir only exists once its epoch was atomically
      * published, so the id in the name IS the in-data id — recovery is
      * an O(#epochs) listing, not an O(data) scan, and a crashed partial
      * write never advances the position. Root-level parquet files from
      * the pre-epoch-dir flat layout are still honored by scanning their
      * `_batch_id` column, so resuming over old data cannot replay
      * already-loaded epochs. */
    def committedMaxBatchId(spark: org.apache.spark.sql.SparkSession): Long = {
      val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(outDir))) return -1L
      val dirIds = committedDirs(spark)
        .map(_.getName.stripPrefix("batch_").toLong)
      val legacy = fs.listStatus(new Path(outDir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val legacyMax =
        if (legacy.isEmpty) -1L
        else try {
          // exclude lookback re-deliveries: replay rows pin _batch_id to
          // Long.MaxValue, and a compaction can fold them into the flat
          // layout — an unfiltered max would jump the recovery position
          // to MaxValue and silently drop every future epoch
          val row = spark.read.parquet(legacy.map(_.getPath.toString): _*)
            .filter(col("_batch_id") =!= Long.MaxValue)
            .agg(max(col("_batch_id"))).collect()(0)
          if (row.isNullAt(0)) -1L else row.getLong(0) // all-empty legacy files
        } catch {
          // a root-level parquet without _batch_id is not epoch data
          case _: org.apache.spark.sql.AnalysisException => -1L
        }
      (dirIds :+ legacyMax).max
    }

    def writeBatch(batch: DataFrame, batchId: Long): Unit = {
      if (batchId <= committedMaxBatchId(batch.sparkSession)) return // replay of a COMPLETE epoch
      publish(batch.withColumn("_batch_id", lit(batchId)), s"batch_$batchId")
    }

    /** Publish a lookback re-delivery (see GraftLoader.lookback) as an
      * atomically-committed epoch OUTSIDE the stream's id space: `batch_N`
      * names are the checkpoint's epoch counter, and a replay stored as
      * `batch_{max+1}` would collide with the stream's genuine next epoch
      * — `writeBatch` would then skip real data as "already committed".
      * Replay epochs live in `replay_<k>` dirs with `_batch_id` pinned to
      * Long.MaxValue, so recovery (`committedMaxBatchId`) ignores them
      * and [[readDeduped]]'s first-delivery order never lets a
      * re-delivery shadow the original. */
    def writeReplayEpoch(batch: DataFrame): Unit = {
      val fs = new Path(outDir).getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      val k = if (!fs.exists(new Path(outDir))) 0
        else fs.listStatus(new Path(outDir))
          .map(_.getPath.getName)
          .filter(_.startsWith("replay_"))
          .map(_.stripPrefix("replay_").toLong)
          .foldLeft(-1L)(math.max) + 1
      publish(batch.withColumn("_batch_id", lit(Long.MaxValue)), s"replay_$k")
    }

    /** Atomic epoch publish via the shared [[Sinks.publish]] protocol. */
    private def publish(df: DataFrame, name: String): Unit = {
      val fs = new Path(outDir).getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      Sinks.publish(fs, outDir, name)(staging =>
        df.write.mode("overwrite").parquet(staging.toString))
    }
  }
}
