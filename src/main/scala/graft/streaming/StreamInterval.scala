package graft.streaming

/** How far back from the committed position a (re)started loader begins
  * consuming (reference semantics: model/StreamInterval.scala:26,33 —
  * `OffsetRange(offset)` rewinds by a number of records per partition,
  * `WatermarkRange(duration)` rewinds to the committed watermark minus a
  * duration). `Current` is the default: resume exactly past the committed
  * position.
  *
  * Rewound records were already delivered once, so the downstream sinker
  * must tolerate re-delivery — dedup on the record key, or idempotent
  * upserts (the reference's RewindingPartitionGroupSinker makes the same
  * demand). The loader re-emits the rewound window as one extra committed
  * epoch before live consumption resumes from the checkpoint.
  */
sealed trait StreamInterval

object StreamInterval {
  /** No rewind — start strictly after the committed position. */
  case object Current extends StreamInterval

  /** Rewind by `records` per source partition (Kafka offset-step analog). */
  final case class OffsetRange(records: Long) extends StreamInterval {
    require(records > 0, s"lookback records must be positive, got $records")
  }

  /** Rewind to committed watermark minus `duration`, per source partition. */
  final case class WatermarkRange(duration: java.time.Duration) extends StreamInterval {
    require(!duration.isNegative && !duration.isZero,
      s"lookback duration must be positive, got $duration")
  }
}
