package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming metrics (reference analog: util/Metrics.scala +
  * KafkaMetricsReporter — semantics only): per-query counters for rows
  * and epochs, fed by Spark's StreamingQueryListener instead of a
  * hand-rolled poll-loop reporter.
  */
class GraftMetrics extends StreamingQueryListener {

  private val rows = new ConcurrentHashMap[String, LongAdder]()
  private val batches = new ConcurrentHashMap[String, LongAdder]()

  private def name(n: String, id: java.util.UUID): String =
    Option(n).getOrElse(id.toString)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val key = name(e.progress.name, e.progress.id)
    rows.computeIfAbsent(key, _ => new LongAdder).add(e.progress.numInputRows)
    if (e.progress.numInputRows > 0)
      batches.computeIfAbsent(key, _ => new LongAdder).increment()
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def rowsLoaded(query: String): Long = Option(rows.get(query)).map(_.sum).getOrElse(0L)
  def epochsCommitted(query: String): Long = Option(batches.get(query)).map(_.sum).getOrElse(0L)
}

object GraftMetrics {
  /** Install a metrics listener on the session and return it. */
  def install(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics
    spark.streams.addListener(m)
    m
  }
}
