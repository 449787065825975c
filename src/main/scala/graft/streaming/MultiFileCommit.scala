package graft.streaming

import java.time.Duration

/** Open-file statistics a commit decision is made over (reference:
  * sink/file/MultiFileCommitStrategy.scala:13 FileStats). */
final case class FileStats(openDuration: Duration, sizeBytes: Long, records: Long)

/** Single-file commit condition — commit once ANY configured limit is
  * reached (reference: sink/file/FileCommitStrategy.scala:40
  * ReachedAnyOf(fileOpenDuration, fileSize, recordsWritten)). The
  * duration limit only participates in the pure decision API here: in
  * Spark the epoch cadence (and therefore any wall-clock flush) is owned
  * by the trigger, exactly as SURVEY §1 notes for commit-jitter. */
final case class ReachedAnyOf(
    maxDuration: Option[Duration] = None,
    maxBytes: Option[Long] = None,
    maxRecords: Option[Long] = None) {
  require(maxDuration.nonEmpty || maxBytes.nonEmpty || maxRecords.nonEmpty,
    "ReachedAnyOf needs at least one limit")

  def shouldCommit(openDuration: Duration, sizeBytes: Long, records: Long): Boolean =
    maxDuration.exists(openDuration.compareTo(_) >= 0) ||
      maxBytes.exists(sizeBytes >= _) ||
      maxRecords.exists(records >= _)
}

/** Commit condition over ALL the open files of a multi-file batch
  * (reference: sink/file/MultiFileCommitStrategy.scala:1 — anyFile /
  * allFiles / total combinators over a single-file strategy).
  *
  * Spark mapping: `AnyFile(records)` is what the runtime's per-file
  * `maxRecordsPerFile` rolling already provides in
  * [[Sinks.recordBatchingSink]]; `Total` is the cross-file budget the
  * runtime lacks and is executed distributed by
  * [[Sinks.multiFileBatchingSink]]; `AllFiles` completes the reference
  * surface for decision-level use. */
sealed trait MultiFileCommit {
  def shouldCommit(files: Seq[FileStats]): Boolean
}

object MultiFileCommit {

  /** Commit when ANY open file satisfies the single-file condition. */
  final case class AnyFile(single: ReachedAnyOf) extends MultiFileCommit {
    def shouldCommit(files: Seq[FileStats]): Boolean =
      files.exists(f => single.shouldCommit(f.openDuration, f.sizeBytes, f.records))
  }

  /** Commit when EVERY open file satisfies the single-file condition. */
  final case class AllFiles(single: ReachedAnyOf) extends MultiFileCommit {
    def shouldCommit(files: Seq[FileStats]): Boolean =
      files.nonEmpty && files.forall(f => single.shouldCommit(f.openDuration, f.sizeBytes, f.records))
  }

  /** Commit when the TOTALS across open files (summed size and records,
    * longest open duration) satisfy the single-file condition. */
  final case class Total(single: ReachedAnyOf) extends MultiFileCommit {
    def shouldCommit(files: Seq[FileStats]): Boolean =
      files.nonEmpty && single.shouldCommit(
        files.map(_.openDuration).max,
        files.map(_.sizeBytes).sum,
        files.map(_.records).sum)
  }

  /** The sequential reset-per-commit batch assignment
    * [[Sinks.multiFileBatchingSink]] runs per partition group: a batch
    * accumulates until its OWN totals reach the budget (the crossing
    * record stays), then the counters reset. Factored pure so specs can
    * property-check the semantics independently of Spark. */
  final class TotalFold(maxBytes: Option[Long], maxRecords: Option[Long]) extends Serializable {
    require(maxBytes.nonEmpty || maxRecords.nonEmpty, "TotalFold needs a budget")
    private var commit = 0L
    private var accBytes = 0L
    private var accRecords = 0L

    /** Restart numbering (a new partition group). */
    def reset(): Unit = { commit = 0L; accBytes = 0L; accRecords = 0L }

    /** Commit index for the next record of `bytes` encoded bytes. */
    def next(bytes: Long): Long = {
      accBytes += bytes
      accRecords += 1
      val c = commit
      if (maxBytes.exists(accBytes >= _) || maxRecords.exists(accRecords >= _)) {
        commit += 1L; accBytes = 0L; accRecords = 0L
      }
      c
    }
  }
}
