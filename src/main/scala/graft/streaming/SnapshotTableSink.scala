package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Iceberg-style snapshot table sink (reference:
  * iceberg/IcebergRecordBatchStorage.scala — offsets committed atomically
  * with the data in table snapshot metadata).
  *
  * Every epoch appends data files and publishes a new snapshot JSON that
  * records its parent, the cumulative committed epoch ids and the consumed
  * offset ranges; `LATEST` is switched by atomic rename. Recovery reads
  * the latest snapshot: an epoch already in `committed` is a replay and is
  * skipped — exactly-once without an external commit log, at any
  * partition count (data-file writes scale out; only the tiny snapshot
  * JSON is driver-side, exactly like Iceberg metadata).
  */
class SnapshotTableSink(tableDir: String) extends Serializable {

  def attach(events: DataFrame, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(writeBatch _)
      .start()

  private def fs(spark: SparkSession) =
    new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseSnapshot(content: String): (Long, Seq[Long]) = {
    val idRe = """"snapshot_id":\s*(-?\d+)""".r
    val committedRe = """"committed":\s*\[([^\]]*)\]""".r
    val id = idRe.findFirstMatchIn(content).map(_.group(1).toLong)
      .getOrElse(sys.error(s"malformed snapshot: $content"))
    val committed = committedRe.findFirstMatchIn(content).map(_.group(1))
      .getOrElse(sys.error(s"malformed snapshot: $content"))
      .split(",").filter(_.trim.nonEmpty).map(_.trim.toLong).toSeq
    (id, committed)
  }

  private def readFile(spark: SparkSession, p: Path): String = {
    val in = fs(spark).open(p)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  /** (snapshotId, cumulative committed epoch ids) of the latest snapshot. */
  def currentSnapshot(spark: SparkSession): Option[(Long, Seq[Long])] = {
    val f = fs(spark)
    val latest = new Path(tableDir, "_snapshots/LATEST")
    if (f.exists(latest)) Some(parseSnapshot(readFile(spark, latest)))
    else {
      // The LATEST pointer switch is delete + rename (rename cannot
      // overwrite on most Hadoop filesystems), so a crash inside that
      // window leaves no pointer but every numbered snapshot intact.
      // Recover from the max-numbered snapshot instead of treating the
      // table as empty — an "empty" answer here would restart snapshot
      // ids at 0, orphan the entire committed history, and let
      // vacuumOrphans delete it.
      val snapDir = new Path(tableDir, "_snapshots")
      if (!f.exists(snapDir)) None
      else {
        val ids = f.listStatus(snapDir).toSeq
          .map(_.getPath.getName)
          .filter(_.endsWith(".json"))
          .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong).toOption)
        if (ids.isEmpty) None
        else Some(parseSnapshot(readFile(spark, new Path(snapDir, s"${ids.max}.json"))))
      }
    }
  }

  private def readCommitted(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    val paths = ids.map(id => s"$tableDir/data/batch=$id")
    // mergeSchema: epochs written under an evolved schema (added columns)
    // read back as the union schema with nulls for pre-evolution rows —
    // the versioned-encoder treatment InDataOffsetSink.read already
    // applies; without it parquet takes one file's schema and silently
    // DROPS the other epochs' new columns
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Read the table as of the latest snapshot (only committed files). */
  def read(spark: SparkSession): DataFrame =
    readCommitted(spark, currentSnapshot(spark).map(_._2).getOrElse(Seq.empty))

  /** Time travel: read the table as of snapshot `snapshotId` — each
    * snapshot records its full cumulative committed set, so any retained
    * snapshot reconstructs its exact table state (Iceberg
    * `VERSION AS OF`). Throws if the snapshot has been expired. */
  def readAsOf(spark: SparkSession, snapshotId: Long): DataFrame = {
    val p = new Path(tableDir, s"_snapshots/$snapshotId.json")
    require(fs(spark).exists(p),
      s"snapshot $snapshotId does not exist (expired or never committed)")
    readCommitted(spark, parseSnapshot(readFile(spark, p))._2)
  }

  /** Incremental (append-only) scan: exactly the records committed AFTER
    * snapshot `fromSnapshotId`, up to and including snapshot
    * `toSnapshotId` — the Iceberg incremental-read contract that lets a
    * downstream job process ONLY new data since its last run instead of
    * rescanning the table. Because every snapshot records its FULL
    * cumulative committed set, the increment is a pure set difference of
    * two metadata files; no data-file bookkeeping, and the read plan
    * touches only the new epochs' directories (partition-pruned at the
    * path level — at 100 TB the scan cost is the increment's size, not
    * the table's). Both snapshots must still be retained. */
  def readChangesBetween(spark: SparkSession, fromSnapshotId: Long,
      toSnapshotId: Long): DataFrame = {
    require(fromSnapshotId <= toSnapshotId,
      s"fromSnapshotId $fromSnapshotId must be <= toSnapshotId $toSnapshotId")
    def committed(id: Long): Seq[Long] = {
      val p = new Path(tableDir, s"_snapshots/$id.json")
      require(fs(spark).exists(p),
        s"snapshot $id does not exist (expired or never committed)")
      parseSnapshot(readFile(spark, p))._2
    }
    val from = committed(fromSnapshotId).toSet
    val to = committed(toSnapshotId)
    // cumulativity invariant: a later snapshot's set contains every
    // earlier one's — a violated invariant means corrupted metadata, and
    // silently diffing it would misreport the increment
    val missing = from -- to.toSet
    require(missing.isEmpty,
      s"snapshot $toSnapshotId is missing epochs ${missing.toSeq.sorted.mkString(",")} " +
        s"committed in $fromSnapshotId — corrupted snapshot metadata")
    readCommitted(spark, to.filterNot(from))
  }

  /** [[readChangesBetween]] from `fromSnapshotId` to the CURRENT
    * snapshot — the common "what's new since my last run" call. Empty
    * frame when nothing new was committed. */
  def readChangesSince(spark: SparkSession, fromSnapshotId: Long): DataFrame =
    currentSnapshot(spark) match {
      case Some((cur, _)) => readChangesBetween(spark, fromSnapshotId, cur)
      case None => spark.emptyDataFrame
    }

  /** Retire snapshot metadata older than the newest `keepLast` (the
    * Iceberg expire-snapshots maintenance op). Data files are never
    * touched: committed sets are cumulative, so every retained snapshot
    * still resolves. Returns the expired snapshot ids. */
  def expireSnapshots(spark: SparkSession, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val f = fs(spark)
    currentSnapshot(spark) match {
      case None => Seq.empty
      case Some((latestId, _)) =>
        // one listStatus, not an exists() probe per historical id — a
        // long-lived table has committed millions of epochs and most are
        // already expired
        val expired = f.listStatus(new Path(tableDir, "_snapshots")).toSeq
          .flatMap(st => st.getPath.getName.stripSuffix(".json").toLongOption
            .filter(_ => st.getPath.getName.endsWith(".json")))
          .filter(_ <= latestId - keepLast)
          .sorted
        expired.foreach(id => f.delete(new Path(tableDir, s"_snapshots/$id.json"), false))
        expired
    }
  }

  /** Delete orphan data directories — `batch=N` dirs not in the latest
    * snapshot's committed set, i.e. epochs that crashed after their data
    * write but before the snapshot publish. Safe concurrently with
    * readers (they resolve paths from committed sets only) but NOT with
    * a writer mid-epoch, whose in-flight dir looks orphaned until its
    * snapshot publishes — the same discipline as Iceberg's
    * remove-orphan-files. Returns the deleted paths. */
  def vacuumOrphans(spark: SparkSession): Seq[String] = {
    val f = fs(spark)
    val dataDir = new Path(tableDir, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val committed = currentSnapshot(spark).map(_._2).getOrElse(Seq.empty).toSet
    val orphans = f.listStatus(dataDir).toSeq
      .filter(_.isDirectory)
      .filter { st =>
        st.getPath.getName match {
          case s if s.startsWith("batch=") =>
            s.stripPrefix("batch=").toLongOption.exists(!committed.contains(_))
          case _ => false
        }
      }
    orphans.foreach(st => f.delete(st.getPath, true))
    orphans.map(_.getPath.toString)
  }

  def writeBatch(batchRaw: DataFrame, batchId: Long): Unit = {
    val spark = batchRaw.sparkSession
    val f = fs(spark)
    val prev = currentSnapshot(spark)
    if (prev.exists(_._2.contains(batchId))) return // replayed epoch
    // cache: the write and the ranges agg would otherwise each re-read the source
    val batch = batchRaw.persist()
    // data files (distributed write)
    batch.write.mode("overwrite").parquet(s"$tableDir/data/batch=$batchId")
    // consumed ranges recorded with the commit (StreamRange analog); the
    // range endpoints come from event_id when the schema carries one —
    // the sink itself is schema-agnostic, so other tables get rows-only
    val hasEventId = batch.columns.contains("event_id")
    val loHi =
      if (hasEventId) Seq(min(col("event_id")), max(col("event_id")))
      else Seq(lit(null), lit(null))
    val ranges = batch.agg(loHi.head, (loHi.tail :+ count(lit(1))): _*).collect()(0)
    batch.unpersist()
    val committed = prev.map(_._2).getOrElse(Seq.empty) :+ batchId
    val snapshotId = prev.map(_._1 + 1).getOrElse(0L)
    val json =
      s"""{"snapshot_id": $snapshotId, "parent": ${prev.map(_._1).getOrElse(-1L)},
         | "committed": [${committed.mkString(",")}],
         | "epoch": $batchId,
         | "range": {"lo": ${ranges.get(0)}, "hi": ${ranges.get(1)}, "rows": ${ranges.get(2)}}}""".stripMargin
    val snapDir = new Path(tableDir, "_snapshots")
    f.mkdirs(snapDir)
    val snapFile = new Path(snapDir, s"$snapshotId.json")
    val out = f.create(snapFile, true)
    out.write(json.getBytes("UTF-8")); out.close()
    // pointer switch: delete + rename (rename cannot overwrite); a crash
    // in the window is repaired by currentSnapshot's max-snapshot fallback
    val tmp = new Path(snapDir, s"LATEST.tmp.$snapshotId")
    val t = f.create(tmp, true); t.write(json.getBytes("UTF-8")); t.close()
    val latest = new Path(snapDir, "LATEST")
    if (f.exists(latest)) f.delete(latest, false)
    Sinks.renameOrThrow(f, tmp, latest)
  }
}
