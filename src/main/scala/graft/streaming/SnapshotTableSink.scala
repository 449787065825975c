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

  /** (snapshotId, cumulative committed epoch ids) of the latest snapshot. */
  def currentSnapshot(spark: SparkSession): Option[(Long, Seq[Long])] = {
    val f = fs(spark)
    val latest = new Path(tableDir, "_snapshots/LATEST")
    if (!f.exists(latest)) None
    else {
      val in = f.open(latest)
      val content = scala.io.Source.fromInputStream(in).mkString
      in.close()
      val idRe = """"snapshot_id":\s*(-?\d+)""".r
      val committedRe = """"committed":\s*\[([^\]]*)\]""".r
      val id = idRe.findFirstMatchIn(content).map(_.group(1).toLong)
        .getOrElse(sys.error(s"malformed snapshot: $content"))
      val committed = committedRe.findFirstMatchIn(content).map(_.group(1))
        .getOrElse(sys.error(s"malformed snapshot: $content"))
        .split(",").filter(_.trim.nonEmpty).map(_.trim.toLong).toSeq
      Some((id, committed))
    }
  }

  /** Read the table as of the latest snapshot (only committed files). */
  def read(spark: SparkSession): DataFrame = {
    val ids = currentSnapshot(spark).map(_._2).getOrElse(Seq.empty)
    val paths = ids.map(id => s"$tableDir/data/batch=$id")
    if (paths.isEmpty) spark.emptyDataFrame else spark.read.parquet(paths: _*)
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
    // consumed ranges recorded with the commit (StreamRange analog)
    val ranges = batch.agg(min(col("event_id")), max(col("event_id")), count(lit(1)))
      .collect()(0)
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
    // atomic pointer switch
    val tmp = new Path(snapDir, s"LATEST.tmp.$snapshotId")
    val t = f.create(tmp, true); t.write(json.getBytes("UTF-8")); t.close()
    val latest = new Path(snapDir, "LATEST")
    if (f.exists(latest)) f.delete(latest, false)
    f.rename(tmp, latest)
  }
}
