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
