package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming transforms (SURVEY.md §2h): watermarked windowed aggregation,
  * in-watermark dedup (the RewindingPartitionGroupSinker replay window),
  * gap sessionization via the native session_window, and a
  * mapGroupsWithState custom-state operator.
  */
object Transforms {

  /** Watermarked tumbling-window aggregation per event type. */
  def windowedAggregation(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Exactly-once replay protection: drop duplicate offsets that arrive
    * within the watermark (reference: RewindingPartitionGroupSinker keeps
    * a replay window and skips already-loaded records). */
  def streamDedup(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Gap-based sessionization with the native session_window — state is
    * merged-window per (user, session), pruned by the watermark. */
  def sessionize(
      events: DataFrame,
      watermark: String = "30 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Stream-static enrichment: join the stream against a (small) static
    * dimension — the dimension is broadcast per epoch, no stream state.
    * (RecordFormatter-with-lookup analog: enrich records on the way in.) */
  def enrich(events: DataFrame, dim: DataFrame, joinCol: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), joinCol)

  case class OpenSession(user_id: Long, start: Long, end: Long, n: Long, value: Double)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, session_value: Double)

  /** Sessionization that emits a session exactly once, WHEN IT CLOSES —
    * flatMapGroupsWithState with an event-time timeout: a session's state
    * times out once the watermark passes session end + gap, at which point
    * the completed session is emitted and its state dropped (bounded
    * state; append-mode output a downstream exactly-once sink can
    * consume). A gap *inside* a batch closes the session inline. This is
    * the emit-on-close shape the reference's per-partition sinkers give
    * loaders, built on custom keyed state instead of session_window's
    * windowed aggregation.
    *
    * Out-of-order events (still ≥ the watermark — older rows are filtered
    * by the operator): an event inside [start − gap, end + gap] of the
    * open session merges, extending EITHER end; an event more than a gap
    * BEFORE the open session is emitted as its own closed singleton
    * session immediately (it can never merge: anything that could bridge
    * it is older than it, hence already late). Retroactively BRIDGING two
    * tracked sessions via a late middle event is the one session_window
    * behavior this operator trades away for emit-once semantics. */
  def sessionizeOnClose(spark: SparkSession, events: DataFrame,
      watermark: String = "30 minutes", gapMs: Long = 1800000L): Dataset[ClosedSession] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    def close(s: OpenSession) = ClosedSession(s.user_id,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.value)
    events
      .withWatermark("ts", watermark)
      // the watermarked ts column itself must reach the stateful operator
      // (event-time timeout is refused if the projection drops it)
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rowsIt: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val done = close(state.get)
            state.remove()
            Iterator.single(done)
          } else {
            val evs = rowsIt.toSeq.map(e => (e._1, e._2.getTime, e._3))
              .sortBy(e => (e._2, e._3))
            val closed = scala.collection.mutable.Buffer[ClosedSession]()
            var open = state.getOption
            evs.foreach { case (_, ms, v) =>
              open match {
                case Some(s) if ms >= s.start - gapMs && ms <= s.end + gapMs =>
                  open = Some(s.copy(start = math.min(s.start, ms),
                    end = math.max(s.end, ms), n = s.n + 1, value = s.value + v))
                case Some(s) if ms > s.end => // in-batch gap: close, start fresh
                  closed += close(s)
                  open = Some(OpenSession(user, ms, ms, 1L, v))
                case Some(_) => // > gap BEFORE the open session: emit alone
                  closed += close(OpenSession(user, ms, ms, 1L, v))
                case None =>
                  open = Some(OpenSession(user, ms, ms, 1L, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout must stay ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }

  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user totals
    * (the shape any bespoke stateful operator takes in graft). */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotal(user, prev.n_events + batch.size,
            prev.total_value + batch.map(_._2).sum)
          state.update(next)
          next
      }
  }
}
